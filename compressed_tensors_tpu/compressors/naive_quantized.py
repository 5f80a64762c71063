"""Naive quantization compressor: weight stored in its closest storage dtype
(int8 / fp8_e4m3), plus int-quantized / float-quantized aliases.

Mirrors `compressors/naive_quantized/base.py:28-164`.
"""

from __future__ import annotations

import jax.numpy as jnp

from compressed_tensors_tpu.compressors.base import (
    COMPRESSIBLE_MODULE_TYPES,
    BaseCompressor,
    TensorStateDict,
)
from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.ops.qparams import maybe_pad_tensor_for_block_quant
from compressed_tensors_tpu.ops.quantize import dequantize, quantize
from compressed_tensors_tpu.quantization import (
    ActivationOrdering,
    QuantizationScheme,
    QuantizationStrategy,
    QuantizationType,
)
from compressed_tensors_tpu.utils import getattr_chain

__all__ = [
    "NaiveQuantizationCompressor",
    "IntQuantizationCompressor",
    "FloatQuantizationCompressor",
]


@BaseCompressor.register(name=CompressionFormat.naive_quantized.value)
class NaiveQuantizationCompressor(BaseCompressor):
    @classmethod
    def compression_param_names(cls, scheme: QuantizationScheme) -> tuple[str, ...]:
        param_names = ("weight", "weight_scale")
        if not getattr_chain(scheme, "weights.symmetric", True):
            param_names += ("weight_zero_point",)
        if getattr_chain(scheme, "weights.actorder", None) == \
                ActivationOrdering.GROUP:
            param_names += ("weight_g_idx",)
        return param_names

    @classmethod
    def compress(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme
    ) -> TensorStateDict:
        state_dict = dict(state_dict)
        weight = state_dict.pop("weight")
        scale = state_dict.get("weight_scale")
        zero_point = state_dict.get("weight_zero_point", None)
        g_idx = state_dict.get("weight_g_idx", None)
        weights = scheme.weights

        original_weight_shape = weight.shape
        if (
            weights.strategy == QuantizationStrategy.BLOCK.value
            and weights.block_structure is not None
        ):
            weight = maybe_pad_tensor_for_block_quant(
                weight, tuple(weights.block_structure)
            )

        quantized_weight = quantize(
            x=weight,
            scale=scale,
            zero_point=zero_point,
            g_idx=g_idx,
            args=weights,
            dtype=jnp.dtype(weights.storage_dtype()),
        )

        if quantized_weight.shape != original_weight_shape:
            quantized_weight = quantized_weight[
                tuple(slice(v) for v in original_weight_shape)
            ]

        state_dict["weight"] = quantized_weight
        return cls._remove_symmetric_zp(state_dict, scheme)

    @classmethod
    def decompress(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme
    ) -> TensorStateDict:
        state_dict = dict(state_dict)
        weight = state_dict.pop("weight")
        scale = state_dict.get("weight_scale")
        zero_point = state_dict.get("weight_zero_point", None)
        g_idx = state_dict.get("weight_g_idx", None)

        state_dict["weight"] = dequantize(
            x_q=weight, scale=scale, zero_point=zero_point, g_idx=g_idx
        )
        return state_dict

    @classmethod
    def can_compress(cls, module_type: str, scheme: QuantizationScheme) -> bool:
        """Fallback: matches any quantized weight scheme."""
        return module_type in COMPRESSIBLE_MODULE_TYPES and \
            scheme.weights is not None


@BaseCompressor.register(name=CompressionFormat.int_quantized.value)
class IntQuantizationCompressor(NaiveQuantizationCompressor):
    """Alias matching W8A8-int style quantization."""

    @classmethod
    def can_compress(cls, module_type: str, scheme: QuantizationScheme) -> bool:
        return (
            module_type in COMPRESSIBLE_MODULE_TYPES
            and scheme.input_activations is not None
            and scheme.weights is not None
            and scheme.weights.type == QuantizationType.INT.value
        )


@BaseCompressor.register(name=CompressionFormat.float_quantized.value)
class FloatQuantizationCompressor(NaiveQuantizationCompressor):
    """Alias matching FP8 W8A8 style quantization."""

    @classmethod
    def can_compress(cls, module_type: str, scheme: QuantizationScheme) -> bool:
        return (
            module_type in COMPRESSIBLE_MODULE_TYPES
            and scheme.input_activations is not None
            and scheme.weights is not None
            and scheme.weights.type == QuantizationType.FLOAT.value
        )
