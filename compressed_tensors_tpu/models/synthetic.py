"""Synthetic compressed-model builders (benchmarks, compile checks, tests).

Weights are generated directly in their packed representation — no dense
materialization — so an 8B-scale W4A16 model builds in its ~4.6GB compressed
footprint.
"""

from __future__ import annotations

import dataclasses

import jax
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


def _synthetic_qt(key, shape, scheme: QuantizationScheme, dtype,
                  use_kernels: bool) -> QuantizedTensor:
    """Random packed weight for `shape`; leading dims (3D stacked MoE
    experts, the reference's slice-wise layout) are supported for the
    pack/int/float formats."""
    *lead, n, k = shape
    args = scheme.weights
    if args is None:
        w = (jax.random.normal(key, shape, dtype=jnp.float32) * 0.02).astype(
            dtype
        )
        return QuantizedTensor(weight=w, shape=shape, scheme=scheme,
                               format=CompressionFormat.dense.value)

    fmt = scheme.format or CompressionFormat.pack_quantized.value
    fmt = CompressionFormat(fmt).value
    k1, k2 = jax.random.split(key)

    if fmt == CompressionFormat.pack_quantized.value:
        g = args.group_size or k
        pc = packed_cols(k, args.num_bits)
        packed = jax.random.randint(
            k1, (*lead, n, pc), minval=-(2**31), maxval=2**31 - 1,
            dtype=jnp.int32
        )
        scale = (
            jax.random.uniform(k2, (*lead, n, k // g), dtype=jnp.float32)
            * 0.002 + 0.001
        ).astype(jnp.bfloat16)
        qt = QuantizedTensor(
            weight_packed=packed, scale=scale, shape=shape, scheme=scheme,
            format=fmt,
        )
        return prepare_for_kernels(qt) if use_kernels else qt

    if fmt in (CompressionFormat.int_quantized.value,
               CompressionFormat.naive_quantized.value):
        wq = jax.random.randint(k1, shape, -127, 128, dtype=jnp.int32).astype(
            jnp.int8
        )
        scale = (
            jax.random.uniform(k2, (*lead, n, 1), dtype=jnp.float32) * 2e-4
            + 1e-4
        )
        qt = QuantizedTensor(weight=wq, scale=scale, shape=shape,
                             scheme=scheme, format=fmt)
        return prepare_for_kernels(qt) if use_kernels else qt

    if fmt == CompressionFormat.float_quantized.value:
        import ml_dtypes

        wq = (jax.random.normal(k1, shape, dtype=jnp.float32) * 100).astype(
            jnp.dtype(ml_dtypes.float8_e4m3fn)
        )
        scale = (
            jax.random.uniform(k2, (*lead, n, 1), dtype=jnp.float32) * 2e-4
            + 1e-4
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
) -> dict:
    """Build a synthetic compressed Llama params pytree.

    :param layer_presets: optional per-layer preset overrides (mixed-scheme
        models, BASELINE config 5)
    """
    H = config.hidden_size
    I = config.intermediate_size
    NH, KVH, D = (config.num_attention_heads, config.num_key_value_heads,
                  config.head_dim)
    V = config.vocab_size

    key = jax.random.PRNGKey(seed)
    keys = iter(jax.random.split(key, config.num_hidden_layers * 12 + 3))

    params: dict = {
        "embed_tokens": (
            jax.random.normal(next(keys), (V, H), dtype=jnp.float32) * 0.02
        ).astype(dtype),
        "norm": jnp.ones((H,), dtype=dtype),
        "layers": [],
    }

    for i in range(config.num_hidden_layers):
        name = (layer_presets[i % len(layer_presets)] if layer_presets
                else preset)
        scheme = preset_name_to_scheme(name, ["Linear"])
        layer = {
            "q_proj": _synthetic_qt(next(keys), (NH * D, H), scheme, dtype,
                                    use_kernels),
            "k_proj": _synthetic_qt(next(keys), (KVH * D, H), scheme, dtype,
                                    use_kernels),
            "v_proj": _synthetic_qt(next(keys), (KVH * D, H), scheme, dtype,
                                    use_kernels),
            "o_proj": _synthetic_qt(next(keys), (H, NH * D), scheme, dtype,
                                    use_kernels),
            "input_layernorm": jnp.ones((H,), dtype=dtype),
            "post_attention_layernorm": jnp.ones((H,), dtype=dtype),
        }
        if config.layer_is_moe(i):
            E = config.num_local_experts
            Im = config.moe_intermediate_size or I
            moe: dict = {
                "router": (
                    jax.random.normal(next(keys), (E, H), dtype=jnp.float32)
                    * 0.02
                ).astype(dtype),
                "experts": {
                    "gate_proj": _synthetic_qt(next(keys), (E, Im, H),
                                               scheme, dtype, use_kernels),
                    "up_proj": _synthetic_qt(next(keys), (E, Im, H),
                                             scheme, dtype, use_kernels),
                    "down_proj": _synthetic_qt(next(keys), (E, H, Im),
                                               scheme, dtype, use_kernels),
                },
            }
            Is = config.shared_expert_intermediate_size
            if Is:
                moe["shared_expert"] = {
                    "gate_proj": _synthetic_qt(next(keys), (Is, H), scheme,
                                               dtype, use_kernels),
                    "up_proj": _synthetic_qt(next(keys), (Is, H), scheme,
                                             dtype, use_kernels),
                    "down_proj": _synthetic_qt(next(keys), (H, Is), scheme,
                                               dtype, use_kernels),
                }
            layer["moe"] = moe
        else:
            layer["gate_proj"] = _synthetic_qt(next(keys), (I, H), scheme,
                                               dtype, use_kernels)
            layer["up_proj"] = _synthetic_qt(next(keys), (I, H), scheme,
                                             dtype, use_kernels)
            layer["down_proj"] = _synthetic_qt(next(keys), (H, I), scheme,
                                               dtype, use_kernels)
        params["layers"].append(layer)

    params["lm_head"] = params["embed_tokens"]
    return params
