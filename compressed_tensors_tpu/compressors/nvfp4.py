"""NVFP4 / MXFP4 packed + MXFP8 compressors.

Mirror `compressors/nvfp4/base.py`, `mxfp4/base.py`, `mxfp8/base.py`:
- NVFP4: FP4 E2M1 nibble-packed weights, fp8_e4m3 group scales (g=16),
  fp32 weight_global_scale
- MXFP4: same packing, uint8 E8M0 scales (g=32), no global scale
- MXFP8: fp8 weights (naive), uint8 E8M0 scales (g=32)
"""

from __future__ import annotations

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from compressed_tensors_tpu.compressors.base import (
    COMPRESSIBLE_MODULE_TYPES,
    BaseCompressor,
    TensorStateDict,
)
from compressed_tensors_tpu.compressors.naive_quantized import (
    NaiveQuantizationCompressor,
)
from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.ops.fp4_pack import (
    pack_fp4_to_uint8,
    unpack_fp4_from_uint8,
)
from compressed_tensors_tpu.ops.mx import compress_mx_scale, decompress_mx_scale
from compressed_tensors_tpu.ops.quantize import dequantize, quantize
from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationScheme,
    QuantizationType,
)
from compressed_tensors_tpu.utils import getattr_chain

__all__ = [
    "NVFP4PackedCompressor",
    "MXFP4PackedCompressor",
    "MXFP8QuantizationCompressor",
]


@BaseCompressor.register(name=CompressionFormat.nvfp4_pack_quantized.value)
class NVFP4PackedCompressor(BaseCompressor):
    @classmethod
    def compression_param_names(cls, scheme: QuantizationScheme) -> tuple[str, ...]:
        param_names = ("weight_packed", "weight_scale", "weight_global_scale")
        if not getattr_chain(scheme, "weights.symmetric", True):
            param_names += ("weight_zero_point",)
        if not getattr_chain(scheme, "input_activations.dynamic", True):
            param_names += ("input_global_scale",)
        return param_names

    @classmethod
    def _compress_scale(cls, scale, weights: QuantizationArgs):
        scale_dtype = weights.scale_dtype or np.dtype(ml_dtypes.float8_e4m3fn)
        return scale.astype(jnp.dtype(scale_dtype))

    @classmethod
    def _decompress_scale(cls, scale, dtype):
        return scale.astype(dtype)

    @classmethod
    def compress(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme
    ) -> TensorStateDict:
        state_dict = dict(state_dict)
        weight = state_dict.pop("weight")
        scale = state_dict.pop("weight_scale")
        global_scale = state_dict.get("weight_global_scale", None)
        zero_point = state_dict.get("weight_zero_point", None)
        weights = scheme.weights

        quantized_weight = quantize(
            x=weight,
            scale=scale,
            global_scale=global_scale,
            zero_point=zero_point,
            args=weights,
        )
        state_dict["weight_packed"] = pack_fp4_to_uint8(quantized_weight)
        state_dict["weight_scale"] = cls._compress_scale(scale, weights)
        return cls._remove_symmetric_zp(state_dict, scheme)

    @classmethod
    def decompress(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme
    ) -> TensorStateDict:
        state_dict = dict(state_dict)
        packed = state_dict.pop("weight_packed")
        scale = state_dict.get("weight_scale")
        global_scale = state_dict.get("weight_global_scale", None)

        m, n = packed.shape
        unpacked = unpack_fp4_from_uint8(packed, m, n * 2)

        scale_float = cls._decompress_scale(scale, unpacked.dtype)

        state_dict["weight"] = dequantize(
            x_q=unpacked,
            scale=scale_float,
            global_scale=global_scale,
            dtype=unpacked.dtype,
        )
        state_dict["weight_scale"] = scale_float
        return state_dict

    @classmethod
    def can_compress(cls, module_type: str, scheme: QuantizationScheme) -> bool:
        """FP4 with group_size=16 (ref nvfp4/base.py:129-138)."""
        return (
            module_type in COMPRESSIBLE_MODULE_TYPES
            and scheme.weights is not None
            and scheme.weights.num_bits == 4
            and scheme.weights.type == QuantizationType.FLOAT.value
            and scheme.weights.group_size == 16
        )


@BaseCompressor.register(name=CompressionFormat.mxfp4_pack_quantized.value)
class MXFP4PackedCompressor(NVFP4PackedCompressor):
    """MXFP4: E8M0 (bias-127 exponent) scale codec, group_size 32."""

    @classmethod
    def compression_param_names(cls, scheme: QuantizationScheme) -> tuple[str, ...]:
        param_names = ("weight_packed", "weight_scale")
        if not getattr_chain(scheme, "weights.symmetric", True):
            param_names += ("weight_zero_point",)
        if not getattr_chain(scheme, "input_activations.dynamic", True):
            param_names += ("input_global_scale",)
        return param_names

    @classmethod
    def _compress_scale(cls, scale, weights: QuantizationArgs):
        scale_dtype = weights.scale_dtype or np.dtype(np.uint8)
        return compress_mx_scale(scale, scale_dtype)

    @classmethod
    def _decompress_scale(cls, scale, dtype):
        return decompress_mx_scale(scale).astype(dtype)

    @classmethod
    def can_compress(cls, module_type: str, scheme: QuantizationScheme) -> bool:
        """FP4 with group_size=32 (ref mxfp4/base.py:57-65)."""
        return (
            module_type in COMPRESSIBLE_MODULE_TYPES
            and scheme.weights is not None
            and scheme.weights.num_bits == 4
            and scheme.weights.type == QuantizationType.FLOAT.value
            and scheme.weights.group_size == 32
        )


@BaseCompressor.register(name=CompressionFormat.mxfp8_quantized.value)
class MXFP8QuantizationCompressor(NaiveQuantizationCompressor):
    """MXFP8: fp8_e4m3 weights with uint8 E8M0 scales (ref mxfp8/base.py)."""

    @classmethod
    def compress(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme
    ) -> TensorStateDict:
        state_dict = NaiveQuantizationCompressor.compress(state_dict, scheme)
        scale = state_dict["weight_scale"]
        scale_dtype = scheme.weights.scale_dtype or np.dtype(np.uint8)
        state_dict["weight_scale"] = compress_mx_scale(scale, scale_dtype)
        return state_dict

    @classmethod
    def decompress(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme
    ) -> TensorStateDict:
        state_dict = dict(state_dict)
        state_dict["weight_scale"] = decompress_mx_scale(
            state_dict["weight_scale"]
        )
        return NaiveQuantizationCompressor.decompress(state_dict, scheme)

    @classmethod
    def can_compress(cls, module_type: str, scheme: QuantizationScheme) -> bool:
        """FP8 group_size=32 with uint8 scales (ref mxfp8/base.py:93-104)."""
        return (
            module_type in COMPRESSIBLE_MODULE_TYPES
            and scheme.weights is not None
            and scheme.weights.num_bits == 8
            and scheme.weights.type == QuantizationType.FLOAT.value
            and scheme.weights.group_size == 32
            and scheme.weights.scale_dtype is not None
            and np.dtype(scheme.weights.scale_dtype) == np.dtype(np.uint8)
        )
