"""Pack-quantized compressor: INT 1-8 bit weights densely packed into int32.

Mirrors `compressors/pack_quantized/base.py:36-177` with the bit-exact codec
from `ops/pack.py`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from compressed_tensors_tpu.compressors.base import (
    COMPRESSIBLE_MODULE_TYPES,
    BaseCompressor,
    TensorStateDict,
)
from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.ops.pack import pack_to_int32, unpack_from_int32
from compressed_tensors_tpu.ops.quantize import dequantize, quantize
from compressed_tensors_tpu.quantization import (
    ActivationOrdering,
    QuantizationScheme,
    QuantizationStrategy,
    QuantizationType,
)
from compressed_tensors_tpu.utils import getattr_chain

__all__ = ["PackedQuantizationCompressor", "PACK_ZP_STRATS"]

PACK_ZP_STRATS = [
    QuantizationStrategy.GROUP.value,
    QuantizationStrategy.CHANNEL.value,
]


@BaseCompressor.register(name=CompressionFormat.pack_quantized.value)
class PackedQuantizationCompressor(BaseCompressor):
    @classmethod
    def compression_param_names(cls, scheme: QuantizationScheme) -> tuple[str, ...]:
        param_names = ("weight_packed", "weight_scale", "weight_shape")
        if not getattr_chain(scheme, "weights.symmetric", True):
            param_names += ("weight_zero_point",)
        if getattr_chain(scheme, "weights.actorder", None) == \
                ActivationOrdering.GROUP:
            param_names += ("weight_g_idx",)
        if (
            getattr_chain(scheme, "input_activations.strategy", None)
            == QuantizationStrategy.TENSOR_GROUP.value
        ):
            param_names += ("input_global_scale",)
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

        quantized_weight = quantize(
            x=weight,
            scale=scale,
            zero_point=zero_point,
            g_idx=g_idx,
            args=weights,
            dtype=jnp.int8,
        )
        state_dict["weight_packed"] = pack_to_int32(
            quantized_weight, weights.num_bits
        )
        state_dict["weight_shape"] = jnp.asarray(weight.shape, dtype=jnp.int64
                                                 if False else jnp.int32)

        if not weights.symmetric and weights.strategy in PACK_ZP_STRATS:
            assert zero_point is not None, \
                "Asymmetric quant requires zero-point values"
            packed_zp = pack_to_int32(
                zero_point.astype(jnp.int8), weights.num_bits, packed_dim=0
            )
            state_dict["weight_zero_point"] = packed_zp

        return cls._remove_symmetric_zp(state_dict, scheme)

    @classmethod
    def decompress(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme
    ) -> TensorStateDict:
        state_dict = dict(state_dict)
        packed = state_dict.pop("weight_packed")
        scale = state_dict.get("weight_scale")
        zero_point = state_dict.get("weight_zero_point", None)
        g_idx = state_dict.get("weight_g_idx", None)
        original_shape = tuple(
            int(v) for v in np.asarray(state_dict.get("weight_shape"))
        )
        weights = scheme.weights

        if not weights.symmetric and weights.strategy in PACK_ZP_STRATS:
            assert zero_point is not None, \
                "Asymmetric quant requires zero-point values"
            original_zp_shape = (*original_shape[:-1], scale.shape[-1])
            zero_point = unpack_from_int32(
                zero_point, weights.num_bits, original_zp_shape, packed_dim=0
            )
            state_dict["weight_zero_point"] = zero_point

        unpacked = unpack_from_int32(packed, weights.num_bits, original_shape)
        state_dict["weight"] = dequantize(
            x_q=unpacked, scale=scale, zero_point=zero_point, g_idx=g_idx
        )
        return state_dict

    @classmethod
    def can_compress(cls, module_type: str, scheme: QuantizationScheme) -> bool:
        """INT-only 1-8 bit weight quant; excludes float activation schemes
        (W4AFP8 goes naive, ref pack_quantized/base.py:165-177)."""
        if scheme.input_activations is not None:
            if scheme.input_activations.type == QuantizationType.FLOAT.value:
                return False
        return (
            module_type in COMPRESSIBLE_MODULE_TYPES
            and scheme.weights is not None
            and 1 <= scheme.weights.num_bits <= 8
            and scheme.weights.type == QuantizationType.INT.value
        )
