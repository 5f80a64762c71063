"""fp8-KV -> int8-cache transcode: numerics and plumbing.

On chips without fp8 conversion hardware the framework serves fp8-KV
checkpoints with an int8 cache re-gridded through the same k_scale/v_scale
(models/llama.py:transcode_fp8_kv_to_int8). The two caches must agree to
8-bit-lattice tolerance, and the helper must be a no-op when disabled or
when no fp8 cache is requested."""

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.flags import flag_overrides
from compressed_tensors_tpu.models.config import LlamaConfig
from compressed_tensors_tpu.models.llama import (
    init_kv_cache,
    llama_forward,
    transcode_fp8_kv_to_int8,
)
from compressed_tensors_tpu.models.synthetic import make_synthetic_llama

CONFIG = LlamaConfig(
    vocab_size=128, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=32,
)


def _params(rng):
    params = make_synthetic_llama(CONFIG, dtype=jnp.float32,
                                  use_kernels=False)
    for layer in params["layers"]:
        layer["k_scale"] = jnp.asarray([0.02], jnp.float32)
        layer["v_scale"] = jnp.asarray([0.02], jnp.float32)
    return params


def _decode_logits(params, cache_dtype, ids):
    B, S = ids.shape
    cache = init_kv_cache(CONFIG, B, S + 4, dtype=jnp.float32,
                          cache_dtype=cache_dtype)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    logits, cache = llama_forward(params, CONFIG, ids, positions, cache,
                                  fresh_prefill=True, use_kernels=False)
    # one decode step so the quantized cache is actually read back
    token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    logits2, _ = llama_forward(params, CONFIG, token[:, None],
                               cache.lengths[:, None], cache,
                               use_kernels=False)
    return np.asarray(logits2[:, -1, :], np.float32)


def test_transcode_noop_without_fp8_cache(rng):
    params = _params(rng)
    out, dtype = transcode_fp8_kv_to_int8(params, None)
    assert dtype is None
    out, dtype = transcode_fp8_kv_to_int8(params, jnp.bfloat16)
    assert dtype == jnp.bfloat16


def test_transcode_disabled_flag(rng):
    params = _params(rng)
    with flag_overrides(fp8_transcode="never"):
        out, dtype = transcode_fp8_kv_to_int8(params, jnp.float8_e4m3fn)
    assert dtype == jnp.float8_e4m3fn


def test_transcode_rescales_and_matches_fp8(rng):
    params = _params(rng)
    ids = jnp.asarray(rng.integers(0, CONFIG.vocab_size, (2, 6)), jnp.int32)

    with flag_overrides(fp8_transcode="always"):
        params_i8, dtype = transcode_fp8_kv_to_int8(params,
                                                    jnp.float8_e4m3fn)
    assert dtype == jnp.int8
    ratio = 448.0 / 127.0
    np.testing.assert_allclose(
        np.asarray(params_i8["layers"][0]["k_scale"]),
        np.asarray(params["layers"][0]["k_scale"]) * ratio, rtol=1e-6)

    logits_fp8 = _decode_logits(params, jnp.float8_e4m3fn, ids)
    logits_i8 = _decode_logits(params_i8, jnp.int8, ids)
    logits_ref = _decode_logits(params, None, ids)

    # both 8-bit caches approximate the unquantized reference; the int8
    # re-grid must be in the same error class as the fp8 original
    err_fp8 = np.abs(logits_fp8 - logits_ref).max()
    err_i8 = np.abs(logits_i8 - logits_ref).max()
    scale_y = np.abs(logits_ref).max()
    assert err_i8 <= max(2 * err_fp8, 0.05 * scale_y), (err_i8, err_fp8)
    np.testing.assert_allclose(logits_i8, logits_fp8,
                               atol=0.1 * scale_y + 1e-3)


def test_serving_engine_transcodes_fp8_cache(rng):
    """ServingEngine(cache_dtype=fp8) re-grids to an int8 cache when the
    transcode applies, and its completions match the fp8-cache engine."""
    from compressed_tensors_tpu.engine import Request, ServingEngine

    params = _params(rng)
    prompts = [rng.integers(0, CONFIG.vocab_size, 5 + i).tolist()
               for i in range(2)]

    def run(transcode):
        with flag_overrides(fp8_transcode=transcode):
            eng = ServingEngine(params, CONFIG, dtype=jnp.float32,
                                max_batch=2, max_len=24, prefill_chunk=8,
                                cache_dtype=jnp.float8_e4m3fn)
        dtype = eng.cache.k.dtype
        for i, p in enumerate(prompts):
            eng.submit(Request(request_id=i, prompt_ids=p,
                               max_new_tokens=4))
        return dtype, {c.request_id: tuple(c.output_ids)
                       for c in eng.run()}

    dtype_i8, out_i8 = run("always")
    dtype_f8, out_f8 = run("never")
    assert dtype_i8 == jnp.int8
    assert str(dtype_f8).startswith("float8")
    # greedy argmax over near-identical 8-bit caches: same tokens on this
    # tiny model
    assert out_i8 == out_f8
