"""Fused decode-attention kernel vs the jnp attention path (interpret
mode): logits parity for bf16 and fp8-quantized KV caches."""

import os
import sys
from pathlib import Path

os.environ["CT_TPU_PALLAS_INTERPRET"] = "1"

import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from testing_utils import make_tiny_llama_checkpoint  # noqa: E402

from compressed_tensors_tpu.models import (  # noqa: E402
    init_kv_cache,
    llama_forward,
    load_llama_params,
)

W4A16_G32 = {
    "config_groups": {
        "group_0": {
            "targets": ["Linear"],
            "weights": {"num_bits": 4, "type": "int", "strategy": "group",
                        "group_size": 32, "symmetric": True},
        }
    },
    "format": "pack-quantized",
    "ignore": ["lm_head"],
    "quant_method": "compressed-tensors",
}


def _setup(rng, tmp_path, kv_scales=False):
    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, W4A16_G32,
                                             kv_scales=kv_scales)
    return load_llama_params(save_dir, run_compressed=True, dtype=jnp.float32)


def _decode_logits(params, config, ids, cache_dtype=None, fused=True):
    """Prefill then 3 decode steps; returns stacked decode logits."""
    B, S = ids.shape
    cache = init_kv_cache(config, B, S + 3, dtype=jnp.float32,
                          cache_dtype=cache_dtype)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))

    env = os.environ
    if not fused:
        env["CT_TPU_ENFORCE_EAGER"] = "1"
    try:
        logits, cache = llama_forward(params, config, jnp.asarray(ids),
                                      positions, cache)
        outs = []
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        for _ in range(3):
            logits, cache = llama_forward(
                params, config, tok[:, None], cache.lengths[:, None], cache
            )
            outs.append(np.asarray(logits[:, 0], np.float32))
            tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    finally:
        env.pop("CT_TPU_ENFORCE_EAGER", None)
    return np.stack(outs)


def test_fused_decode_matches_jnp(rng, tmp_path):
    params, config, _ = _setup(rng, tmp_path)
    ids = rng.integers(0, config.vocab_size, size=(2, 5))
    fused = _decode_logits(params, config, ids, fused=True)
    eager = _decode_logits(params, config, ids, fused=False)
    np.testing.assert_allclose(fused, eager, atol=2e-3, rtol=1e-2)


def test_fused_decode_fp8_kv(rng, tmp_path):
    params, config, _ = _setup(rng, tmp_path, kv_scales=True)
    assert "k_scale" in params["layers"][0]
    ids = rng.integers(0, config.vocab_size, size=(1, 5))
    cache_dtype = jnp.dtype(ml_dtypes.float8_e4m3fn)
    fused = _decode_logits(params, config, ids, cache_dtype=cache_dtype,
                           fused=True)
    eager = _decode_logits(params, config, ids, cache_dtype=cache_dtype,
                           fused=False)
    np.testing.assert_allclose(fused, eager, atol=5e-2, rtol=5e-2)
