"""Qwen-family model support: attention bias (Qwen2) and per-head q/k
RMSNorm (Qwen3) through the checkpoint -> load -> forward path."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from testing_utils import TINY_LLAMA_CONFIG, make_tiny_llama_checkpoint  # noqa: E402

from compressed_tensors_tpu.models import llama_forward, load_llama_params
from compressed_tensors_tpu.models.config import LlamaConfig
from compressed_tensors_tpu.ops.fuse import fuse_llama_layers

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


def _cfg(model_type):
    cfg = dict(TINY_LLAMA_CONFIG)
    cfg["model_type"] = model_type
    if model_type.startswith("qwen2"):
        cfg["architectures"] = ["Qwen2ForCausalLM"]
    elif model_type.startswith("qwen3"):
        cfg["architectures"] = ["Qwen3ForCausalLM"]
    return cfg


def test_config_flags():
    assert LlamaConfig.from_dict(_cfg("qwen2")).attention_bias
    assert not LlamaConfig.from_dict(_cfg("qwen2")).qk_norm
    assert LlamaConfig.from_dict(_cfg("qwen3")).qk_norm
    assert not LlamaConfig.from_dict(_cfg("qwen3")).attention_bias
    assert not LlamaConfig.from_dict(_cfg("llama")).attention_bias
    # explicit attention_bias key wins over the model-type default
    d = _cfg("llama")
    d["attention_bias"] = True
    assert LlamaConfig.from_dict(d).attention_bias


@pytest.mark.parametrize("model_type", ["qwen2", "qwen3"])
def test_qwen_checkpoint_forward(rng, tmp_path, model_type):
    save_dir, states = make_tiny_llama_checkpoint(
        tmp_path, rng, W4A16_G32, model_config=_cfg(model_type)
    )
    params, config, _ = load_llama_params(save_dir, dtype=jnp.float32)
    if model_type == "qwen2":
        assert config.attention_bias
        assert params["layers"][0]["q_proj"].bias is not None
        # the original bias survives the compress/save/load round trip
        np.testing.assert_allclose(
            np.asarray(params["layers"][0]["q_proj"].bias),
            np.asarray(states["model.layers.0.self_attn.q_proj"]["bias"]),
            atol=1e-6,
        )
    else:
        assert config.qk_norm
        assert "q_norm" in params["layers"][0]
        assert "k_norm" in params["layers"][0]

    ids = jnp.asarray(rng.integers(0, config.vocab_size, size=(2, 6)),
                      dtype=jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(6), (2, 6))
    logits, cache = jax.jit(
        lambda p, i, pos: llama_forward(p, config, i, pos)
    )(params, ids, positions)
    assert logits.shape == (2, 6, config.vocab_size)
    assert np.isfinite(np.asarray(logits, np.float32)).all()

    # fused projections keep the bias (or stay unfused, never drop it)
    fused = fuse_llama_layers(params)
    logits_f, _ = jax.jit(
        lambda p, i, pos: llama_forward(p, config, i, pos)
    )(fused, ids, positions)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits),
                               atol=2e-4, rtol=2e-4)
