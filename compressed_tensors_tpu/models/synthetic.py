"""Synthetic compressed-model builders (benchmarks, compile checks, tests).

Weights are generated directly in their packed representation — no dense
materialization — so an 8B-scale W4A16 model builds in its ~4.6GB compressed
footprint.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.models.config import LlamaConfig
from compressed_tensors_tpu.ops.linear import (
    QuantizedTensor,
    prepare_for_kernels,
)
from compressed_tensors_tpu.ops.pack import packed_cols
from compressed_tensors_tpu.quantization import (
    QuantizationScheme,
    preset_name_to_scheme,
)

__all__ = ["make_synthetic_llama", "LLAMA3_8B", "TINYLLAMA_1_1B"]

TINYLLAMA_1_1B = LlamaConfig(
    vocab_size=32000, hidden_size=2048, intermediate_size=5632,
    num_hidden_layers=22, num_attention_heads=32, num_key_value_heads=4,
    head_dim=64, rope_theta=10000.0, max_position_embeddings=2048,
)

LLAMA3_8B = LlamaConfig(
    vocab_size=128256, hidden_size=4096, intermediate_size=14336,
    num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
    head_dim=128, rope_theta=500000.0, max_position_embeddings=8192,
)


def _synthetic_qt(rng: np.random.Generator, shape,
                  scheme: QuantizationScheme, dtype,
                  use_kernels: bool) -> QuantizedTensor:
    """Random packed weight for `shape`; leading dims (3D stacked MoE
    experts, the reference's slice-wise layout) are supported for the
    pack/int/float formats.

    Generation happens on host (numpy) — one `jax.random` dispatch per
    tensor means one XLA compile per distinct shape, which dominates
    build time on a remote chip; a host draw + single transfer is ~200x
    faster there.
    """
    *lead, n, k = shape
    args = scheme.weights
    if args is None:
        w = jnp.asarray(
            rng.standard_normal(shape, dtype=np.float32) * 0.02, dtype=dtype
        )
        return QuantizedTensor(weight=w, shape=shape, scheme=scheme,
                               format=CompressionFormat.dense.value)

    fmt = scheme.format
    if fmt is None:
        # infer like compressors/format.py: 8-bit schemes store the quant
        # dtype directly (int8/fp8 -> the fused W8A8 MXU kernels); sub-byte
        # int packs into int32
        if args.num_bits == 8 and args.type == "int":
            fmt = CompressionFormat.int_quantized.value
        elif args.num_bits == 8 and args.type == "float":
            fmt = CompressionFormat.float_quantized.value
        else:
            fmt = CompressionFormat.pack_quantized.value
    fmt = CompressionFormat(fmt).value

    if fmt == CompressionFormat.pack_quantized.value:
        g = args.group_size or k
        pc = packed_cols(k, args.num_bits)
        packed = jnp.asarray(
            rng.integers(-(2**31), 2**31, size=(*lead, n, pc),
                         dtype=np.int32)
        )
        scale = jnp.asarray(
            rng.uniform(size=(*lead, n, k // g)).astype(np.float32)
            * 0.002 + 0.001, dtype=jnp.bfloat16,
        )
        qt = QuantizedTensor(
            weight_packed=packed, scale=scale, shape=shape, scheme=scheme,
            format=fmt,
        )
        if use_kernels:
            if lead:
                from compressed_tensors_tpu.ops.linear import (
                    prepare_experts_for_kernels,
                )

                return prepare_experts_for_kernels(qt)
            return prepare_for_kernels(qt)
        return qt

    if fmt in (CompressionFormat.int_quantized.value,
               CompressionFormat.naive_quantized.value):
        wq = jnp.asarray(
            rng.integers(-127, 128, size=shape, dtype=np.int8)
        )
        scale = jnp.asarray(
            rng.uniform(size=(*lead, n, 1)).astype(np.float32) * 2e-4 + 1e-4
        )
        qt = QuantizedTensor(weight=wq, scale=scale, shape=shape,
                             scheme=scheme, format=fmt)
        return prepare_for_kernels(qt) if use_kernels else qt

    if fmt == CompressionFormat.float_quantized.value:
        import ml_dtypes

        wq = jnp.asarray(
            np.clip(rng.standard_normal(shape, dtype=np.float32) * 100,
                    -440, 440).astype(ml_dtypes.float8_e4m3fn)
        )  # clip inside the e4m3fn range: overflow casts to NaN
        scale = jnp.asarray(
            rng.uniform(size=(*lead, n, 1)).astype(np.float32) * 2e-4 + 1e-4
        )
        qt = QuantizedTensor(weight=wq, scale=scale, shape=shape,
                             scheme=scheme, format=fmt)
        return prepare_for_kernels(qt) if use_kernels else qt

    raise NotImplementedError(fmt)


def make_synthetic_llama(
    config: LlamaConfig,
    preset: str = "W4A16",
    seed: int = 0,
    dtype=jnp.bfloat16,
    use_kernels: bool = True,
    layer_presets: list[str] | None = None,
    lm_head_preset: str | None = None,
) -> dict:
    """Build a synthetic compressed Llama params pytree.

    :param layer_presets: optional per-layer preset overrides (mixed-scheme
        models, BASELINE config 5)
    :param lm_head_preset: quantize the lm_head with this preset instead of
        tying it to the bf16 embedding table (the lm_head is the single
        largest bf16 weight at decode — 0.13 GB for TinyLlama vs 0.48 GB
        for ALL other weights packed)
    """
    H = config.hidden_size
    I = config.intermediate_size
    NH, KVH, D = (config.num_attention_heads, config.num_key_value_heads,
                  config.head_dim)
    V = config.vocab_size

    rng = np.random.default_rng(seed)

    params: dict = {
        "embed_tokens": jnp.asarray(
            rng.standard_normal((V, H), dtype=np.float32) * 0.02, dtype=dtype
        ),
        "norm": jnp.ones((H,), dtype=dtype),
        "layers": [],
    }

    for i in range(config.num_hidden_layers):
        name = (layer_presets[i % len(layer_presets)] if layer_presets
                else preset)
        scheme = preset_name_to_scheme(name, ["Linear"])
        layer = {
            "q_proj": _synthetic_qt(rng, (NH * D, H), scheme, dtype,
                                    use_kernels),
            "k_proj": _synthetic_qt(rng, (KVH * D, H), scheme, dtype,
                                    use_kernels),
            "v_proj": _synthetic_qt(rng, (KVH * D, H), scheme, dtype,
                                    use_kernels),
            "o_proj": _synthetic_qt(rng, (H, NH * D), scheme, dtype,
                                    use_kernels),
            "input_layernorm": jnp.ones((H,), dtype=dtype),
            "post_attention_layernorm": jnp.ones((H,), dtype=dtype),
        }
        if config.layer_is_moe(i):
            E = config.num_local_experts
            Im = config.moe_intermediate_size or I
            moe: dict = {
                "router": jnp.asarray(
                    rng.standard_normal((E, H), dtype=np.float32) * 0.02,
                    dtype=dtype,
                ),
                "experts": {
                    "gate_proj": _synthetic_qt(rng, (E, Im, H),
                                               scheme, dtype, use_kernels),
                    "up_proj": _synthetic_qt(rng, (E, Im, H),
                                             scheme, dtype, use_kernels),
                    "down_proj": _synthetic_qt(rng, (E, H, Im),
                                               scheme, dtype, use_kernels),
                },
            }
            Is = config.shared_expert_intermediate_size
            if Is:
                moe["shared_expert"] = {
                    "gate_proj": _synthetic_qt(rng, (Is, H), scheme,
                                               dtype, use_kernels),
                    "up_proj": _synthetic_qt(rng, (Is, H), scheme,
                                             dtype, use_kernels),
                    "down_proj": _synthetic_qt(rng, (H, Is), scheme,
                                               dtype, use_kernels),
                }
            layer["moe"] = moe
        else:
            layer["gate_proj"] = _synthetic_qt(rng, (I, H), scheme,
                                               dtype, use_kernels)
            layer["up_proj"] = _synthetic_qt(rng, (I, H), scheme,
                                             dtype, use_kernels)
            layer["down_proj"] = _synthetic_qt(rng, (H, I), scheme,
                                               dtype, use_kernels)
        params["layers"].append(layer)

    if lm_head_preset is not None:
        scheme = preset_name_to_scheme(lm_head_preset, ["Linear"])
        params["lm_head"] = _synthetic_qt(rng, (V, H), scheme, dtype,
                                          use_kernels)
    else:
        params["lm_head"] = params["embed_tokens"]
    return params
