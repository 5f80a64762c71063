"""MX (MXFP4/MXFP8) E8M0 scale math.

Mirrors `quantization/utils/mxfp_utils.py` and `compressors/mx_utils.py`:
scales are biased power-of-2 exponents (bias 127) stored as uint8.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from compressed_tensors_tpu.quantization.quant_args import (
    FP4_E2M1_DATA,
    FP8_E4M3_DATA,
    QuantizationArgs,
    QuantizationType,
)

__all__ = [
    "round_to_power_2",
    "generate_mx_scales",
    "should_generate_mx_scales",
    "maybe_convert_from_mx_exp",
    "compress_mx_scale",
    "decompress_mx_scale",
]

# floor(log2(elem_max)): FP4 max=6 -> 2; FP8 max=448 -> 8
# (ref mxfp_utils.py:32-35)
_MX_ELEM_OFFSET = {
    4: int(math.floor(math.log2(FP4_E2M1_DATA.max))),
    8: int(math.floor(math.log2(FP8_E4M3_DATA.max))),
}

_FLOAT_LAYOUT = {
    # dtype name -> (uint dtype, mantissa bits, exponent bits)
    "bfloat16": (jnp.uint16, 7, 8),
    "float16": (jnp.uint16, 10, 5),
    "float32": (jnp.uint32, 23, 8),
    "float64": (jnp.uint64, 52, 11),
}


def should_generate_mx_scales(args: QuantizationArgs) -> bool:
    """MX formats: 4/8-bit float, group_size 32, uint8 scales
    (ref mxfp_utils.py:38-44)."""
    return (
        args.num_bits in (4, 8)
        and args.type == QuantizationType.FLOAT.value
        and args.group_size == 32
        and args.scale_dtype is not None
        and np.dtype(args.scale_dtype) == np.dtype(np.uint8)
    )


def round_to_power_2(x: jnp.ndarray) -> jnp.ndarray:
    """Round values to the closest power of 2 via exponent-bit masking
    (ref mxfp_utils.py:70-121). Conservatively rounds down after adding
    half an FP4 mantissa step."""
    name = str(x.dtype)
    if name not in _FLOAT_LAYOUT:
        raise TypeError(f"Unsupported dtype {x.dtype}")
    uint_dtype, mantissa, exponent = _FLOAT_LAYOUT[name]

    bits = jax.lax.bitcast_convert_type(x, uint_dtype)
    val_to_add = 1 << (mantissa - FP4_E2M1_DATA.mantissa - 1)
    sign_exponent_mask = ((1 << (exponent + 1)) - 1) << mantissa
    masked = jnp.bitwise_and(bits + jnp.asarray(val_to_add, uint_dtype),
                             jnp.asarray(sign_exponent_mask, uint_dtype))
    return jax.lax.bitcast_convert_type(masked, x.dtype)


def generate_mx_scales(x: jnp.ndarray, num_bits: int = 4) -> jnp.ndarray:
    """Per-group max-abs -> biased E8M0 exponent (ref mxfp_utils.py:124-142).

    Returned in x.dtype (float); callers round to uint8 via
    round_to_quantized_type_dtype like the reference.
    """
    offset = _MX_ELEM_OFFSET[num_bits]
    scale_power_2 = round_to_power_2(x)
    return 127 + jnp.floor(jnp.log2(scale_power_2)) - offset


def maybe_convert_from_mx_exp(
    args: QuantizationArgs, scale: jnp.ndarray
) -> jnp.ndarray:
    """If args indicate MX, treat scale as E8M0 exponents and convert to
    float power-of-2 scales (ref mxfp_utils.py:47-67)."""
    if should_generate_mx_scales(args):
        original_dtype = scale.dtype
        scale_exp = scale.astype(jnp.int32) - 127
        return (2.0 ** scale_exp.astype(jnp.float32)).astype(original_dtype)
    return scale


def compress_mx_scale(scale: jnp.ndarray, scale_dtype=np.uint8) -> jnp.ndarray:
    """float scale -> E8M0 biased exponent (ref compressors/mx_utils.py:19-31)."""
    scale_exp = 127 + jnp.floor(jnp.log2(scale.astype(jnp.float32))).astype(jnp.int32)
    return scale_exp.astype(np.dtype(scale_dtype))


def decompress_mx_scale(scale: jnp.ndarray) -> jnp.ndarray:
    """E8M0 biased exponent -> bfloat16 power-of-2 scale
    (ref compressors/mx_utils.py:34-44)."""
    scale_exp = scale.astype(jnp.int32) - 127
    return (2.0 ** scale_exp.astype(jnp.bfloat16)).astype(jnp.bfloat16)
