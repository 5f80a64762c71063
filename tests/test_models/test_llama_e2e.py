"""End-to-end: tiny quantized Llama checkpoint -> load -> forward/generate.

Covers the engine's core promises:
- run-compressed forward == decompressed forward (fused dequant correctness)
- incremental decode with KV cache == full prefill logits
- FP8 KV-cache quantization path (k_scale/v_scale)
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from testing_utils import make_tiny_llama_checkpoint  # noqa: E402

from compressed_tensors_tpu.engine import greedy_generate  # noqa: E402
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
    "quantization_status": "frozen",
}

W8A8_INT = {
    "config_groups": {
        "group_0": {
            "targets": ["Linear"],
            "weights": {"num_bits": 8, "type": "int", "strategy": "channel",
                        "symmetric": True},
            "input_activations": {"num_bits": 8, "type": "int",
                                  "strategy": "token", "symmetric": True,
                                  "dynamic": True},
        }
    },
    "format": "int-quantized",
    "ignore": ["lm_head"],
    "quant_method": "compressed-tensors",
    "quantization_status": "frozen",
}

FP8_DYN = {
    "config_groups": {
        "group_0": {
            "targets": ["Linear"],
            "weights": {"num_bits": 8, "type": "float", "strategy": "channel",
                        "symmetric": True},
            "input_activations": {"num_bits": 8, "type": "float",
                                  "strategy": "token", "symmetric": True,
                                  "dynamic": True},
        }
    },
    "format": "float-quantized",
    "ignore": ["lm_head"],
    "quant_method": "compressed-tensors",
    "quantization_status": "frozen",
}


def _forward_logits(params, config, ids):
    positions = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
    logits, _ = llama_forward(params, config, jnp.asarray(ids), positions)
    return np.asarray(logits, dtype=np.float32)


def test_w4a16_run_compressed_matches_decompressed(rng, tmp_path):
    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, W4A16_G32)

    params_c, config, _ = load_llama_params(save_dir, run_compressed=True,
                                            dtype=jnp.float32)
    params_d, _, _ = load_llama_params(save_dir, run_compressed=False,
                                       dtype=jnp.float32)

    # compressed path really is compressed
    assert params_c["layers"][0]["q_proj"].weight_packed is not None
    assert params_d["layers"][0]["q_proj"].weight_packed is None

    ids = rng.integers(0, config.vocab_size, size=(2, 8))
    lc = _forward_logits(params_c, config, ids)
    ld = _forward_logits(params_d, config, ids)
    np.testing.assert_allclose(lc, ld, atol=2e-3, rtol=1e-2)


def test_load_with_fused_kernels_matches(rng, tmp_path, monkeypatch):
    """use_kernels=True at load (interpret mode): the fused-kernel layouts
    built by the loader must produce the same logits as the XLA path."""
    from compressed_tensors_tpu.flags import FLAGS, set_flags

    monkeypatch.setattr(FLAGS, "pallas_interpret", True)
    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, W4A16_G32)
    params_k, config, _ = load_llama_params(save_dir, run_compressed=True,
                                            dtype=jnp.float32,
                                            use_kernels=True)
    params_x, _, _ = load_llama_params(save_dir, run_compressed=True,
                                       dtype=jnp.float32, use_kernels=False)
    assert params_k["layers"][0]["q_proj"].kernel_packed is not None
    assert params_x["layers"][0]["q_proj"].kernel_packed is None

    ids = rng.integers(0, config.vocab_size, size=(2, 8))
    lk = _forward_logits(params_k, config, ids)
    lx = _forward_logits(params_x, config, ids)
    np.testing.assert_allclose(lk, lx, atol=2e-3, rtol=1e-2)


@pytest.mark.parametrize("qconfig", [W8A8_INT, FP8_DYN],
                         ids=["w8a8-int", "fp8-dynamic"])
def test_quantized_act_paths_run(rng, tmp_path, qconfig):
    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, qconfig)
    params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                          dtype=jnp.float32)
    q = params["layers"][0]["q_proj"]
    assert q.weight is not None  # naive repr
    ids = rng.integers(0, config.vocab_size, size=(1, 8))
    logits = _forward_logits(params, config, ids)
    assert np.isfinite(logits).all()

    # int8/fp8 paths approximate the decompressed computation
    params_d, _, _ = load_llama_params(save_dir, run_compressed=False,
                                       dtype=jnp.float32)
    ld = _forward_logits(params_d, config, ids)
    # activation quantization introduces modest error on random tiny nets
    assert np.abs(logits - ld).mean() < 0.5


def test_incremental_decode_matches_prefill(rng, tmp_path):
    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, W4A16_G32)
    params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                          dtype=jnp.float32)

    ids = rng.integers(0, config.vocab_size, size=(1, 6))
    full = _forward_logits(params, config, ids)

    # token-by-token with cache
    cache = init_kv_cache(config, 1, 6, dtype=jnp.float32)
    outs = []
    for t in range(6):
        tok = jnp.asarray(ids[:, t : t + 1])
        positions = jnp.full((1, 1), t, dtype=jnp.int32)
        logits, cache = llama_forward(params, config, tok, positions, cache)
        outs.append(np.asarray(logits[:, 0], dtype=np.float32))
    inc = np.stack(outs, axis=1)
    np.testing.assert_allclose(full, inc, atol=2e-3, rtol=1e-2)


def test_greedy_generate(rng, tmp_path):
    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, W4A16_G32)
    params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                          dtype=jnp.float32)
    ids = rng.integers(0, config.vocab_size, size=(2, 4))
    out = greedy_generate(params, config, ids, max_new_tokens=5,
                          dtype=jnp.float32)
    assert out.shape == (2, 9)
    assert (np.asarray(out[:, :4]) == ids).all()


def test_fp8_kv_cache(rng, tmp_path):
    import ml_dtypes

    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, W4A16_G32,
                                             kv_scales=True)
    params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                          dtype=jnp.float32)
    assert "k_scale" in params["layers"][0]

    ids = rng.integers(0, config.vocab_size, size=(1, 8))
    positions = jnp.broadcast_to(jnp.arange(8), (1, 8))

    cache = init_kv_cache(config, 1, 8, dtype=jnp.float32,
                          cache_dtype=jnp.dtype(ml_dtypes.float8_e4m3fn))
    logits_q, cache = llama_forward(params, config, jnp.asarray(ids),
                                    positions, cache)
    assert str(cache.k.dtype).startswith("float8")

    logits_f = _forward_logits(params, config, ids)
    # fp8 KV introduces bounded error
    assert np.abs(np.asarray(logits_q, np.float32) - logits_f).mean() < 0.5
