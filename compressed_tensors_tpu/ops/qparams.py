"""Quantization-parameter math: ranges, scale/zero-point calculation,
dynamic scales, global scales, block padding.

jnp re-implementation of `quantization/utils/helpers.py:50-428` with the same
numerics: zero always representable, eps flooring (fp8=0.125, fp4=0.25),
NVFP4 global-scale composition, MX E8M0 conversion.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from compressed_tensors_tpu.ops.mx import (
    generate_mx_scales,
    maybe_convert_from_mx_exp,
    should_generate_mx_scales,
)
from compressed_tensors_tpu.quantization.quant_args import (
    FP4_E2M1_DATA,
    FP8_E4M3_DATA,
    FloatArgs,
    QuantizationArgs,
    QuantizationStrategy,
    QuantizationType,
    round_to_quantized_type_dtype,
)

__all__ = [
    "calculate_range",
    "calculate_qparams",
    "compute_dynamic_scales_and_zp",
    "generate_gparam",
    "strategy_cdiv",
    "calculate_block_padding",
    "maybe_pad_tensor_for_block_quant",
    "KV_CACHE_TARGETS",
]

# targets for KV-cache scale attachment (ref helpers.py:45)
KV_CACHE_TARGETS = ["re:.*(self_attn|attention)$"]


def calculate_range(args: QuantizationArgs) -> tuple[float, float]:
    """Effective quantization range endpoints (ref helpers.py:198-226)."""
    if args.type == QuantizationType.INT.value:
        bit_range = 2.0**args.num_bits
        return (-bit_range / 2, bit_range / 2 - 1)
    elif args.type == QuantizationType.FLOAT.value:
        if args.num_bits == 8:
            return (FP8_E4M3_DATA.min, FP8_E4M3_DATA.max)
        elif args.num_bits == 4:
            return (FP4_E2M1_DATA.min, FP4_E2M1_DATA.max)
        raise NotImplementedError("Range calculation only supported for 4 and 8 bits")
    raise ValueError(f"Invalid quantization type {args.type}")


def _get_dtype_eps(dtype) -> float:
    """eps floor used to avoid zero scales (ref helpers.py:363-371)."""
    dt = np.dtype(dtype)
    if dt == np.dtype(ml_dtypes.float8_e4m3fn):
        return 0.125
    if dt.kind in "iu":
        return 1.0
    try:
        return float(ml_dtypes.finfo(dt).eps)
    except Exception:
        return 1.0


def calculate_qparams(
    min_vals: jnp.ndarray,
    max_vals: jnp.ndarray,
    quantization_args: QuantizationArgs,
    global_scale: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scales and zero points from observed min/max (ref helpers.py:50-137).

    Returns (scales, zero_points); zero_points are in args.zp_dtype.
    """
    # 0.0 must always be representable within the quantized range
    min_vals = jnp.minimum(min_vals, jnp.zeros_like(min_vals))
    max_vals = jnp.maximum(max_vals, jnp.zeros_like(max_vals))

    bit_min, bit_max = calculate_range(quantization_args)
    bit_range = bit_max - bit_min

    if quantization_args.symmetric:
        max_val_pos = jnp.maximum(jnp.abs(min_vals), jnp.abs(max_vals))
        if should_generate_mx_scales(quantization_args):
            scales = generate_mx_scales(
                max_val_pos, num_bits=quantization_args.num_bits
            )
        else:
            scales = max_val_pos / (float(bit_range) / 2)
        zero_points = jnp.zeros(scales.shape, dtype=min_vals.dtype)
    else:
        if (
            quantization_args.num_bits == 4
            and quantization_args.type == QuantizationType.FLOAT.value
        ):
            raise NotImplementedError(
                "Asymmetric Quantization is not supported for FP4"
            )
        scales = (max_vals - min_vals) / float(bit_range)
        zero_points = bit_min - (min_vals / scales)
        zero_points = jnp.clip(zero_points, bit_min, bit_max)

    if global_scale is not None:
        scales = global_scale * scales

    if quantization_args.scale_dtype is not None:
        scales = round_to_quantized_type_dtype(
            scales, dtype=quantization_args.scale_dtype
        )

    scales = maybe_convert_from_mx_exp(quantization_args, scales)

    eps = _get_dtype_eps(
        quantization_args.scale_dtype
        if quantization_args.scale_dtype is not None
        else scales.dtype
    )
    scales = jnp.where(scales == 0, jnp.asarray(eps, scales.dtype), scales)

    zero_points = round_to_quantized_type_dtype(
        zero_points, dtype=quantization_args.zp_dtype, cast_to_original_dtype=False
    )

    if scales.ndim == 0:
        scales = scales.reshape(1)
        zero_points = zero_points.reshape(1)

    return scales, zero_points


def compute_dynamic_scales_and_zp(
    value: jnp.ndarray,
    args: QuantizationArgs,
    global_scale: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic (on-the-fly) scale/zp computation (ref helpers.py:140-195).

    TOKEN: reduce all dims except (0, 1); TENSOR: full reduce;
    GROUP/TENSOR_GROUP: reduce within last-dim groups.
    """
    keep_dims = True
    if args.strategy == QuantizationStrategy.TOKEN.value:
        dims = {0, 1}
        reduce_dims = tuple(i for i in range(value.ndim) if i not in dims)
    elif args.strategy == QuantizationStrategy.TENSOR.value:
        reduce_dims = None
    elif args.strategy in (
        QuantizationStrategy.TENSOR_GROUP.value,
        QuantizationStrategy.GROUP.value,
    ):
        reduce_dims = -1
        keep_dims = False
        num_groups = math.ceil(value.shape[-1] / args.group_size)
        value = value.reshape(*value.shape[:-1], num_groups, args.group_size)
    else:
        raise ValueError(
            "Dynamic quantization is only supported for "
            "token/tensor/group/tensor_group"
        )

    if not reduce_dims:
        min_val = jnp.min(value)
        max_val = jnp.max(value)
    else:
        min_val = jnp.min(value, axis=reduce_dims, keepdims=keep_dims)
        max_val = jnp.max(value, axis=reduce_dims, keepdims=keep_dims)

    return calculate_qparams(min_val, max_val, args, global_scale=global_scale)


def generate_gparam(
    updated_min_val: jnp.ndarray,
    updated_max_val: jnp.ndarray,
    scale_data: type[FloatArgs] = FP8_E4M3_DATA,
    quant_data: type[FloatArgs] = FP4_E2M1_DATA,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """NVFP4 global scale = fp8_max * fp4_max / maxabs, NaN/Inf -> 1.0
    (ref helpers.py:308-337)."""
    min_vals = jnp.minimum(updated_min_val, jnp.zeros_like(updated_min_val))
    max_vals = jnp.maximum(updated_max_val, jnp.zeros_like(updated_max_val))
    max_val_pos = jnp.maximum(jnp.abs(min_vals), jnp.abs(max_vals))
    tiny = float(np.finfo(np.dtype(max_val_pos.dtype) if max_val_pos.dtype
                          in (jnp.float32, jnp.float64) else np.float32).tiny)
    max_val_pos = jnp.maximum(max_val_pos, tiny)
    global_scale = scale_data.max * quant_data.max / max_val_pos
    global_scale = jnp.nan_to_num(global_scale, nan=1.0, posinf=1.0, neginf=1.0)
    return global_scale.astype(dtype).reshape([1])


def strategy_cdiv(
    value: int,
    divisor: int,
    strategy: QuantizationStrategy | None = None,
    strict: bool = False,
) -> int:
    """ceil-div with divisibility warning/error (ref helpers.py:340-360)."""
    dividend = math.ceil(value / divisor)
    if dividend * divisor != value:
        message = (
            f"{strategy} quantization strategy requires strict division of "
            f"weight/activation size {value} and group/block size {divisor}."
        )
        if strict:
            raise ValueError(message)
        import logging

        logging.getLogger(__name__).warning(message)
    return dividend


def calculate_block_padding(
    shape: tuple[int, ...], block_structure: tuple[int, int]
) -> tuple[int, int]:
    """Padding to make dims divisible by block size (ref helpers.py:374-397)."""
    if len(shape) < 2:
        raise ValueError(f"Tensor must be at least 2D, got shape {shape}")
    rows, cols = shape[-2], shape[-1]
    block_height, block_width = block_structure
    pad_rows = (block_height - rows % block_height) % block_height
    pad_cols = (block_width - cols % block_width) % block_width
    return pad_rows, pad_cols


def maybe_pad_tensor_for_block_quant(
    tensor: jnp.ndarray, block_structure: tuple[int, int]
) -> jnp.ndarray:
    """Zero-pad trailing 2 dims to block-divisible sizes (ref helpers.py:400-428)."""
    pad_rows, pad_cols = calculate_block_padding(tensor.shape, block_structure)
    if pad_rows == 0 and pad_cols == 0:
        return tensor
    pad_width = [(0, 0)] * (tensor.ndim - 2) + [(0, pad_rows), (0, pad_cols)]
    return jnp.pad(tensor, pad_width)
