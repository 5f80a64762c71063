"""DeepSeek-style MLA attention: absorbed-decode (fused kernel over the
latent cache) vs the non-absorbed eager path, latent cache shape, and
generate consistency."""

import os
import sys
from pathlib import Path

os.environ["CT_TPU_PALLAS_INTERPRET"] = "1"

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
from testing_utils import make_tiny_llama_checkpoint  # noqa: E402

from compressed_tensors_tpu.engine import greedy_generate  # noqa: E402
from compressed_tensors_tpu.models import (  # noqa: E402
    init_kv_cache,
    llama_forward,
    load_llama_params,
)

MLA_CONFIG = {
    "model_type": "deepseek_v3",
    "vocab_size": 256,
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 4,
    "q_lora_rank": 32,
    "kv_lora_rank": 32,
    "qk_nope_head_dim": 16,
    "qk_rope_head_dim": 8,
    "v_head_dim": 16,
    "rope_theta": 10000.0,
    "max_position_embeddings": 128,
}

W4A16_G16 = {
    "config_groups": {
        "group_0": {
            "targets": ["Linear"],
            "weights": {"num_bits": 4, "type": "int", "strategy": "group",
                        "group_size": 16, "symmetric": True},
        }
    },
    "format": "pack-quantized",
    "ignore": ["lm_head"],
    "quant_method": "compressed-tensors",
}


def _setup(rng, tmp_path, model_config=MLA_CONFIG):
    save_dir, _ = make_tiny_llama_checkpoint(
        tmp_path, rng, W4A16_G16, model_config=model_config)
    return load_llama_params(save_dir, run_compressed=True,
                             dtype=jnp.float32)


def test_mla_config_and_cache_shape(rng, tmp_path):
    params, config, _ = _setup(rng, tmp_path)
    assert config.is_mla and config.kv_lora_rank == 32
    assert "kv_a_proj_with_mqa" in params["layers"][0]
    assert "q_a_proj" in params["layers"][0]
    cache = init_kv_cache(config, 2, 16, dtype=jnp.float32)
    # one latent head, lane-padded latent width (32 + 8 -> 128)
    assert cache.k.shape == (2, 2, 1, 64, 128)


def _decode_logits(params, config, ids, fused):
    B, S = ids.shape
    cache = init_kv_cache(config, B, S + 4, dtype=jnp.float32)
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


def test_mla_absorbed_decode_matches_eager(rng, tmp_path):
    """Fused absorbed-matmul decode over the latent cache == non-absorbed
    eager attention."""
    params, config, _ = _setup(rng, tmp_path)
    ids = rng.integers(0, config.vocab_size, size=(2, 6))
    fused = _decode_logits(params, config, ids, fused=True)
    eager = _decode_logits(params, config, ids, fused=False)
    np.testing.assert_allclose(fused, eager, atol=2e-3, rtol=1e-2)


def test_mla_no_q_lora_variant(rng, tmp_path):
    """V2-lite style dense q_proj (q_lora_rank null)."""
    cfg = dict(MLA_CONFIG, q_lora_rank=None)
    params, config, _ = _setup(rng, tmp_path, model_config=cfg)
    assert "q_proj" in params["layers"][0]
    ids = rng.integers(0, config.vocab_size, size=(1, 5))
    fused = _decode_logits(params, config, ids, fused=True)
    eager = _decode_logits(params, config, ids, fused=False)
    np.testing.assert_allclose(fused, eager, atol=2e-3, rtol=1e-2)


def test_mla_greedy_generate(rng, tmp_path):
    params, config, _ = _setup(rng, tmp_path)
    ids = rng.integers(0, config.vocab_size, size=(1, 4)).astype(np.int32)
    out = greedy_generate(params, config, ids, max_new_tokens=6,
                          dtype=jnp.float32)
    assert out.shape == (1, 10)
