"""Quantize / dequantize / fake-quantize (the QDQ math core).

jnp re-implementation of `quantization/lifecycle/forward.py:37-241` and
`forward_helpers.py:19-215`. All functions are pure and jit-friendly when
`args` is treated as static (it is hashable pydantic data); strategy-specific
reshapes happen at trace time.

Unlike the reference there is no Triton/eager split: XLA fuses these
elementwise chains into surrounding ops, and the hot paths (weight dequant
inside matmul, dynamic act quant) additionally have dedicated Pallas kernels
in `ops/kernels/`.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from compressed_tensors_tpu.ops.fp4 import cast_to_fp4
from compressed_tensors_tpu.ops.qparams import (
    calculate_range,
    maybe_pad_tensor_for_block_quant,
)
from compressed_tensors_tpu.quantization.quant_args import (
    QuantizationArgs,
    QuantizationStrategy,
    QuantizationType,
)

__all__ = ["quantize", "dequantize", "fake_quantize"]


def _round_to_quantized_type_args(x, args: QuantizationArgs, q_min, q_max):
    """Clamp + round to the quantized grid, keeping the input dtype
    (ref quant_args.py:460-496)."""
    x = jnp.clip(x, q_min, q_max)
    if args.type == QuantizationType.FLOAT.value:
        if args.num_bits == 8:
            return x.astype(ml_dtypes.float8_e4m3fn).astype(x.dtype)
        elif args.num_bits == 4:
            return cast_to_fp4(x)
        raise NotImplementedError("Only num_bits in (4, 8) are supported")
    elif args.type == QuantizationType.INT.value:
        return jnp.round(x)
    raise ValueError(f"Invalid quantization type {args.type}")


def _quantize_op(x, scale, zero_point, q_min, q_max, args, dtype, global_scale):
    if global_scale is not None:
        scale = scale / global_scale
    scaled = x / scale.astype(x.dtype)
    if zero_point is not None:
        scaled = scaled + zero_point.astype(x.dtype)
    q = _round_to_quantized_type_args(scaled, args, q_min, q_max)
    if dtype is not None:
        q = q.astype(dtype)
    return q


def _dequantize_op(x_q, scale, zero_point, dtype, global_scale):
    if global_scale is not None:
        scale = scale / global_scale
    # compute in float32 when scale is a narrow float (fp16/bf16/fp8) to match
    # reference accumulation in scale dtype closely without fp8 arithmetic
    compute_dtype = scale.dtype
    if str(compute_dtype).startswith("float8"):
        compute_dtype = jnp.float32
    dq = x_q.astype(compute_dtype)
    if zero_point is not None:
        dq = dq - zero_point.astype(compute_dtype)
    dq = dq * scale.astype(compute_dtype)
    if dtype is not None:
        dq = dq.astype(dtype)
    return dq


def _qdq_op(x, scale, zero_point, q_min, q_max, args, global_scale):
    """Fused quantize-then-dequantize, single scale division
    (ref forward_helpers.py:180-215)."""
    if global_scale is not None:
        scale = scale / global_scale
    scaled = x / scale.astype(x.dtype)
    if zero_point is not None:
        scaled = scaled + zero_point.astype(x.dtype)
    q = _round_to_quantized_type_args(scaled, args, q_min, q_max)
    dq = q.astype(scale.dtype)
    if zero_point is not None:
        dq = dq - zero_point.astype(scale.dtype)
    return dq * scale


def _apply(x, scale, zero_point, q_min, q_max, args, dtype,
           do_quantize, do_dequantize, global_scale):
    if do_quantize and do_dequantize:
        return _qdq_op(x, scale, zero_point, q_min, q_max, args, global_scale)
    elif do_quantize:
        return _quantize_op(x, scale, zero_point, q_min, q_max, args, dtype,
                            global_scale)
    else:
        return _dequantize_op(x, scale, zero_point, dtype, global_scale)


def _process_block(x, scale, zero_point, args, q_min, q_max, dtype,
                   do_quantize, do_dequantize, global_scale):
    """Blockwise: pad, reshape to (Rb, bh, Cb, bw) -> (Rb, Cb, bh, bw), apply,
    restore (ref forward_helpers.py:62-115)."""
    original_shape = x.shape
    block_height, block_width = args.block_structure

    x = maybe_pad_tensor_for_block_quant(x, args.block_structure)
    padded_shape = x.shape

    num_rows_blocks = padded_shape[0] // block_height
    num_cols_blocks = padded_shape[1] // block_width
    x_blocks = x.reshape(
        num_rows_blocks, block_height, num_cols_blocks, block_width
    ).transpose(0, 2, 1, 3)

    sb = scale[..., None, None]
    zb = zero_point[..., None, None] if zero_point is not None else None

    x_blocks = _apply(x_blocks, sb, zb, q_min, q_max, args, dtype,
                      do_quantize, do_dequantize, global_scale)

    output = x_blocks.transpose(0, 2, 1, 3).reshape(padded_shape)
    if original_shape != padded_shape:
        output = output[tuple(slice(v) for v in original_shape)]
    return output


def _process_group(x, scale, zero_point, args, q_min, q_max, dtype,
                   do_quantize, do_dequantize, g_idx, global_scale):
    """Group/tensor-group: optional activation-order permutation, reshape last
    dim into (groups, group_size), apply, restore
    (ref forward_helpers.py:118-177)."""
    group_size = args.group_size
    output_dtype = dtype if dtype is not None else x.dtype
    columns = x.shape[-1]

    while scale.ndim < 2:
        scale = scale[..., None]
        zero_point = zero_point[..., None] if zero_point is not None else None

    if columns >= group_size and columns % group_size != 0:
        raise ValueError(
            "tensor column shape must be divisible "
            f"by the given group_size {group_size} but got {columns}"
        )

    # activation ordering: g_idx maps column -> group; runtime permutes columns
    # so groups are contiguous (ref :149-153). g_idx of all -1 means unset.
    is_column_order = g_idx is None
    perm = None
    if not is_column_order:
        perm = jnp.argsort(g_idx)
        x = jnp.take(x, perm, axis=-1)

    num_groups = math.ceil(x.shape[-1] / group_size)
    x = x.reshape(*x.shape[:-1], num_groups, group_size)

    output = _apply(
        x,
        scale[..., None],
        zero_point[..., None] if zero_point is not None else None,
        q_min, q_max, args, dtype, do_quantize, do_dequantize, global_scale,
    )

    output = output.reshape(*output.shape[:-2], num_groups * group_size)
    output = output.astype(output_dtype)

    if not is_column_order:
        inv_perm = jnp.argsort(perm)
        output = jnp.take(output, inv_perm, axis=-1)

    return output


def _process_quantization(x, scale, zero_point, args, g_idx=None, dtype=None,
                          do_quantize=True, do_dequantize=True,
                          global_scale=None):
    q_min, q_max = calculate_range(args)

    if args.strategy == QuantizationStrategy.BLOCK.value:
        return _process_block(x, scale, zero_point, args, q_min, q_max, dtype,
                              do_quantize, do_dequantize, global_scale)
    elif args.strategy in (
        QuantizationStrategy.GROUP.value,
        QuantizationStrategy.TENSOR_GROUP.value,
    ):
        return _process_group(x, scale, zero_point, args, q_min, q_max, dtype,
                              do_quantize, do_dequantize, g_idx, global_scale)
    else:
        # tensor, channel, token, attn_head: plain broadcasting
        return _apply(x, scale, zero_point, q_min, q_max, args, dtype,
                      do_quantize, do_dequantize, global_scale)


def quantize(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    zero_point: jnp.ndarray | None,
    args: QuantizationArgs,
    dtype=None,
    g_idx: jnp.ndarray | None = None,
    global_scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Quantize x per the strategy in args (ref forward.py:37-73)."""
    return _process_quantization(
        x=x, scale=scale, zero_point=zero_point, args=args, dtype=dtype,
        do_quantize=True, do_dequantize=False, g_idx=g_idx,
        global_scale=global_scale,
    )


def infer_args_from_scale_shape(x_q_shape, scale_shape) -> QuantizationArgs:
    """Infer strategy from scale shape (ref forward.py:99-130):
    ndim 0/1 -> tensor; (r,1) -> channel; row-matched -> group; else block."""
    ndim = len(scale_shape)
    if ndim == 0 or ndim == 1:
        return QuantizationArgs(strategy=QuantizationStrategy.TENSOR)
    elif ndim == 2:
        if scale_shape[1] == 1:
            return QuantizationArgs(strategy=QuantizationStrategy.CHANNEL)
        elif scale_shape[0] == 1 or scale_shape[0] == x_q_shape[0]:
            group_size = int(x_q_shape[1] / scale_shape[1])
            return QuantizationArgs(
                strategy=QuantizationStrategy.GROUP, group_size=group_size
            )
        else:
            rows, cols = x_q_shape[-2], x_q_shape[-1]
            block_height = rows // scale_shape[0]
            block_width = cols // scale_shape[1]
            return QuantizationArgs(
                strategy=QuantizationStrategy.BLOCK,
                block_structure=[block_height, block_width],
            )
    raise ValueError(
        f"Could not infer a quantization strategy from scale with {ndim} "
        "dimensions. Expected 0 or 2 dimensions."
    )


def dequantize(
    x_q: jnp.ndarray,
    scale: jnp.ndarray,
    zero_point: jnp.ndarray | None = None,
    args: QuantizationArgs | None = None,
    dtype=None,
    g_idx: jnp.ndarray | None = None,
    global_scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Dequantize x_q; infers strategy from scale shape if args is None
    (ref forward.py:77-145)."""
    if args is None:
        args = infer_args_from_scale_shape(x_q.shape, scale.shape)
    if dtype is None:
        dtype = scale.dtype
        if str(dtype).startswith("float8") or np.dtype(dtype).kind in "iu":
            dtype = jnp.float32

    return _process_quantization(
        x=x_q, scale=scale, zero_point=zero_point, args=args,
        do_quantize=False, do_dequantize=True, dtype=dtype, g_idx=g_idx,
        global_scale=global_scale,
    )


def fake_quantize(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    zero_point: jnp.ndarray | None,
    args: QuantizationArgs,
    g_idx: jnp.ndarray | None = None,
    global_scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Quantize-then-dequantize (ref forward.py:149-181)."""
    return _process_quantization(
        x=x, scale=scale, zero_point=zero_point, args=args,
        do_quantize=True, do_dequantize=True, g_idx=g_idx,
        global_scale=global_scale,
    )
