"""Shared test helpers: build tiny quantized Llama checkpoints on disk."""

import json
import os

import jax.numpy as jnp
import numpy as np

from compressed_tensors_tpu.compressors import (
    ModelCompressor,
    module_graph_from_names,
)
from compressed_tensors_tpu.compressors.model_compressor import (
    resolve_module_schemes,
)
from compressed_tensors_tpu.ops import calculate_qparams

TINY_LLAMA_CONFIG = {
    "architectures": ["LlamaForCausalLM"],
    "model_type": "llama",
    "vocab_size": 128,
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "max_position_embeddings": 512,
    "tie_word_embeddings": False,
}


def observe_minmax(w, args):
    w = np.asarray(w, dtype=np.float32)
    if args.strategy == "channel":
        return w.min(-1, keepdims=True), w.max(-1, keepdims=True)
    if args.strategy in ("group", "tensor_group"):
        g = w.reshape(w.shape[0], -1, args.group_size)
        return g.min(-1), g.max(-1)
    if args.strategy == "tensor":
        return w.min(), w.max()
    if args.strategy == "block":
        bh, bw = args.block_structure
        r, c = w.shape
        b = w.reshape(r // bh, bh, c // bw, bw).transpose(0, 2, 1, 3)
        return b.min(axis=(2, 3)), b.max(axis=(2, 3))
    raise ValueError(args.strategy)


def make_tiny_llama_checkpoint(
    tmp_path,
    rng,
    quant_config: dict,
    model_config: dict | None = None,
    kv_scales: bool | str = False,
):
    """Create a random tiny Llama checkpoint, quantize + compress it with our
    own save path, and return (save_dir, dense module states)."""
    cfg = dict(model_config or TINY_LLAMA_CONFIG)
    H = cfg["hidden_size"]
    I = cfg["intermediate_size"]
    V = cfg["vocab_size"]
    KVH = cfg["num_key_value_heads"]
    D = cfg.get("head_dim") or H // cfg["num_attention_heads"]
    NH = cfg["num_attention_heads"]

    names, states, extra = [], {}, {}
    model_type = cfg.get("model_type", "llama")
    attn_bias = cfg.get("attention_bias",
                        model_type in ("qwen2", "qwen2_moe"))
    qk_norm = model_type in ("qwen3", "qwen3_moe")

    def add(name, shape, bias=False):
        names.append(name)
        states[name] = {
            "weight": jnp.asarray(
                (rng.normal(size=shape) * 0.05).astype(np.float32)
            )
        }
        if bias:
            states[name]["bias"] = jnp.asarray(
                (rng.normal(size=shape[0]) * 0.05).astype(np.float32)
            )

    add("model.embed_tokens", (V, H))
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}"
        kv_lora = cfg.get("kv_lora_rank", 0) or 0
        if kv_lora:
            # DeepSeek V2/V3 MLA attention weights
            nope = cfg["qk_nope_head_dim"]
            rope_d = cfg["qk_rope_head_dim"]
            vd = cfg["v_head_dim"]
            q_lora = cfg.get("q_lora_rank") or 0
            if q_lora:
                add(f"{p}.self_attn.q_a_proj", (q_lora, H))
                add(f"{p}.self_attn.q_b_proj",
                    (NH * (nope + rope_d), q_lora))
                extra[f"{p}.self_attn.q_a_layernorm.weight"] = np.ones(
                    q_lora, np.float32)
            else:
                add(f"{p}.self_attn.q_proj", (NH * (nope + rope_d), H))
            add(f"{p}.self_attn.kv_a_proj_with_mqa", (kv_lora + rope_d, H))
            extra[f"{p}.self_attn.kv_a_layernorm.weight"] = np.ones(
                kv_lora, np.float32)
            add(f"{p}.self_attn.kv_b_proj", (NH * (nope + vd), kv_lora))
            add(f"{p}.self_attn.o_proj", (H, NH * vd))
        else:
            add(f"{p}.self_attn.q_proj", (NH * D, H), bias=attn_bias)
            add(f"{p}.self_attn.k_proj", (KVH * D, H), bias=attn_bias)
            add(f"{p}.self_attn.v_proj", (KVH * D, H), bias=attn_bias)
            add(f"{p}.self_attn.o_proj", (H, NH * D))
        if qk_norm:
            extra[f"{p}.self_attn.q_norm.weight"] = np.ones(D, np.float32)
            extra[f"{p}.self_attn.k_norm.weight"] = np.ones(D, np.float32)
        num_experts = cfg.get("num_experts", 0)
        if num_experts:
            Im = cfg.get("moe_intermediate_size", I)
            extra[f"{p}.mlp.gate.weight"] = (
                rng.normal(size=(num_experts, H)) * 0.05
            ).astype(np.float32)
            for j in range(num_experts):
                add(f"{p}.mlp.experts.{j}.gate_proj", (Im, H))
                add(f"{p}.mlp.experts.{j}.up_proj", (Im, H))
                add(f"{p}.mlp.experts.{j}.down_proj", (H, Im))
        else:
            add(f"{p}.mlp.gate_proj", (I, H))
            add(f"{p}.mlp.up_proj", (I, H))
            add(f"{p}.mlp.down_proj", (H, I))
        extra[f"{p}.input_layernorm.weight"] = np.ones(H, dtype=np.float32)
        extra[f"{p}.post_attention_layernorm.weight"] = np.ones(
            H, dtype=np.float32
        )
        if kv_scales == "per_head":
            # attn_head strategy: head-shaped (KVH, 1, 1) scales with
            # distinct per-head values (ref initialize.py:279-334)
            extra[f"{p}.self_attn.k_scale"] = (
                0.015 + 0.01 * np.arange(KVH, dtype=np.float32)
            ).reshape(KVH, 1, 1)
            extra[f"{p}.self_attn.v_scale"] = (
                0.03 - 0.005 * np.arange(KVH, dtype=np.float32)
            ).reshape(KVH, 1, 1)
        elif kv_scales:
            extra[f"{p}.self_attn.k_scale"] = np.asarray([0.02], np.float32)
            extra[f"{p}.self_attn.v_scale"] = np.asarray([0.02], np.float32)
    extra["model.norm.weight"] = np.ones(H, dtype=np.float32)
    add("lm_head", (V, H))

    modules = module_graph_from_names(names)
    mc = ModelCompressor.from_compression_config(quant_config)

    # calibrate static qparams
    schemes = resolve_module_schemes(modules, mc.quantization_config)
    for name, scheme in schemes.items():
        if scheme.weights is None:
            continue
        args = scheme.weights
        mn, mx = observe_minmax(states[name]["weight"], args)
        scale, zp = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)
        states[name]["weight_scale"] = scale
        if not args.symmetric:
            states[name]["weight_zero_point"] = zp

    save_dir = str(tmp_path / "tiny_llama")
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(cfg, f)

    mc.save_checkpoint(save_dir, states, modules, extra_tensors=extra)
    return save_dir, states
