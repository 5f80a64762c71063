"""MoE layer tests: routing math, dispatch/combine correctness vs a dense
per-token reference, quantized stacked-expert matmul, and end-to-end MoE
llama forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.models.config import LlamaConfig
from compressed_tensors_tpu.models.llama import llama_forward
from compressed_tensors_tpu.models.moe import moe_capacity, moe_mlp
from compressed_tensors_tpu.models.synthetic import make_synthetic_llama
from compressed_tensors_tpu.ops.linear import (
    QuantizedTensor,
    materialize_weight,
    quantized_matmul_experts,
)
from compressed_tensors_tpu.quantization import preset_name_to_scheme


def _moe_config(**kw):
    defaults = dict(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, num_local_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=128,
    )
    defaults.update(kw)
    return LlamaConfig(**defaults)


def _dense_moe_reference(layer, x, config):
    """Per-token loop reference: every token runs its top-k experts densely."""
    moe = layer["moe"]
    B, S, H = x.shape
    tokens = np.asarray(x.reshape(B * S, H), dtype=np.float32)
    router = np.asarray(moe["router"], dtype=np.float32)
    logits = tokens @ router.T
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))

    experts = moe["experts"]
    w_gate = np.asarray(materialize_weight(experts["gate_proj"],
                                           dtype=jnp.float32))
    w_up = np.asarray(materialize_weight(experts["up_proj"],
                                         dtype=jnp.float32))
    w_down = np.asarray(materialize_weight(experts["down_proj"],
                                           dtype=jnp.float32))

    k = config.num_experts_per_tok
    out = np.zeros_like(tokens)
    for t in range(tokens.shape[0]):
        top = np.argsort(-probs[t])[:k]
        weights = probs[t][top]
        if config.norm_topk_prob:
            weights = weights / weights.sum()
        for e, w in zip(top, weights):
            h = tokens[t] @ w_gate[e].T
            u = tokens[t] @ w_up[e].T
            act = h / (1 + np.exp(-h)) * u
            out[t] += w * (act @ w_down[e].T)
    return out.reshape(B, S, H)


def test_moe_capacity_static():
    assert moe_capacity(64, 4, 2, 1.0) == 32
    assert moe_capacity(1, 8, 2, 1.25) == 8  # floor at one sublane tile
    assert moe_capacity(64, 4, 2, 1.25) % 8 == 0


@pytest.mark.parametrize("preset", ["UNQUANTIZED", "W4A16", "W8A8"])
def test_moe_mlp_matches_dense_reference(preset):
    config = _moe_config()
    params = make_synthetic_llama(config, preset=preset, use_kernels=False,
                                  dtype=jnp.float32)
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, config.hidden_size),
                          dtype=jnp.float32) * 0.5
    # generous capacity so the reference (no drops) matches exactly
    got = np.asarray(moe_mlp(layer, x, config, capacity_factor=4.0))
    want = _dense_moe_reference(layer, x, config)
    tol = 2e-2 if preset == "W8A8" else 2e-3
    np.testing.assert_allclose(got, want, atol=tol, rtol=tol)


def test_quantized_matmul_experts_w4a16():
    config = _moe_config()
    scheme = preset_name_to_scheme("W4A16", ["Linear"])
    from compressed_tensors_tpu.models.synthetic import _synthetic_qt

    qt = _synthetic_qt(np.random.default_rng(0), (4, 128, 128), scheme,
                       jnp.float32, use_kernels=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 128),
                          dtype=jnp.float32)
    got = np.asarray(quantized_matmul_experts(x, qt))
    w = np.asarray(materialize_weight(qt, dtype=jnp.float32))
    want = np.einsum("eck,enk->ecn", np.asarray(x), w)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_moe_llama_forward_and_decode():
    config = _moe_config(first_k_dense_replace=1)
    params = make_synthetic_llama(config, preset="W4A16", use_kernels=False,
                                  dtype=jnp.float32)
    assert "moe" not in params["layers"][0]      # leading dense layer
    assert "moe" in params["layers"][1]

    input_ids = jnp.arange(12, dtype=jnp.int32).reshape(2, 6)
    positions = jnp.broadcast_to(jnp.arange(6), (2, 6))
    logits, cache = jax.jit(
        lambda p, i, pos: llama_forward(p, config, i, pos)
    )(params, input_ids, positions)
    assert logits.shape == (2, 6, config.vocab_size)
    assert np.isfinite(np.asarray(logits, dtype=np.float32)).all()

    # one decode step reusing the cache
    from compressed_tensors_tpu.models.llama import init_kv_cache

    cache = init_kv_cache(config, 2, 16)
    logits, cache = llama_forward(params, config, input_ids, positions, cache)
    nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    logits2, cache = llama_forward(
        params, config, nxt,
        jnp.full((2, 1), 6, dtype=jnp.int32), cache,
    )
    assert logits2.shape == (2, 1, config.vocab_size)
    assert np.isfinite(np.asarray(logits2, dtype=np.float32)).all()


def test_moe_checkpoint_roundtrip(tmp_path):
    """W4A16 MoE checkpoint -> load run-compressed and decompressed ->
    logits agree (fused dequant correctness on stacked experts)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from testing_utils import make_tiny_llama_checkpoint

    from compressed_tensors_tpu.models import load_llama_params

    rng = np.random.default_rng(0)
    cfg = {
        "architectures": ["Qwen2MoeForCausalLM"],
        "model_type": "qwen2_moe",
        "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 512,
        "num_experts": 4, "num_experts_per_tok": 2,
        "moe_intermediate_size": 64, "norm_topk_prob": True,
    }
    qconfig = {
        "config_groups": {
            "group_0": {
                "targets": ["Linear"],
                "weights": {"num_bits": 4, "type": "int", "strategy": "group",
                            "group_size": 32, "symmetric": True},
            }
        },
        "format": "pack-quantized",
        "ignore": ["lm_head", "re:.*mlp\\.gate$"],
        "quant_method": "compressed-tensors",
        "quantization_status": "frozen",
    }
    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, qconfig,
                                             model_config=cfg)
    params_c, config, _ = load_llama_params(save_dir, run_compressed=True,
                                            dtype=jnp.float32)
    params_d, _, _ = load_llama_params(save_dir, run_compressed=False,
                                       dtype=jnp.float32)
    assert config.is_moe
    assert "moe" in params_c["layers"][0]
    experts = params_c["layers"][0]["moe"]["experts"]["gate_proj"]
    assert experts.shape == (4, 64, 64)
    assert experts.weight_packed is not None
    assert experts.weight_packed.shape[0] == 4

    ids = jnp.arange(10, dtype=jnp.int32).reshape(1, 10)
    pos = jnp.broadcast_to(jnp.arange(10), (1, 10))
    lc, _ = llama_forward(params_c, config, ids, pos)
    ld, _ = llama_forward(params_d, config, ids, pos)
    np.testing.assert_allclose(np.asarray(lc), np.asarray(ld),
                               atol=1e-3, rtol=1e-3)


def test_moe_shared_expert():
    config = _moe_config(shared_expert_intermediate_size=128)
    params = make_synthetic_llama(config, preset="W4A16", use_kernels=False,
                                  dtype=jnp.float32)
    layer = params["layers"][0]
    assert "shared_expert" in layer["moe"]
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, config.hidden_size),
                          dtype=jnp.float32)
    out = moe_mlp(layer, x, config, capacity_factor=4.0)
    # shared expert contribution is additive on top of the routed output
    routed = moe_mlp(
        layer | {"moe": {k: v for k, v in layer["moe"].items()
                         if k != "shared_expert"}},
        x, config, capacity_factor=4.0,
    )
    assert not np.allclose(np.asarray(out), np.asarray(routed))
    assert np.isfinite(np.asarray(out)).all()
