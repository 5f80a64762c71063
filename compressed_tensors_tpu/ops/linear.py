"""Quantized linear algebra: the engine-side weight representation and the
matmul path for every compression format.

This is the seam where the reference delegates to vLLM kernels
(`linear/compressed_linear.py:15-21` is a deprecated stub; decompress-on-load
is its default). Here run-compressed is the default execution mode: weights
stay in their compressed representation in HBM and are dequantized inside
the matmul (Pallas kernels in `ops/kernels/`, jnp fallback here).

`QuantizedTensor` is a pytree: array leaves + static metadata, so model
forwards jit cleanly with per-layer kernel specialization.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.ops.fp4_pack import unpack_fp4_from_uint8
from compressed_tensors_tpu.ops.mx import decompress_mx_scale
from compressed_tensors_tpu.ops.pack import unpack_from_int32
from compressed_tensors_tpu.ops.qparams import compute_dynamic_scales_and_zp
from compressed_tensors_tpu.ops.quantize import dequantize, quantize
from compressed_tensors_tpu.quantization import (
    QuantizationScheme,
    QuantizationStrategy,
)

__all__ = [
    "QuantizedTensor",
    "quantized_matmul",
    "quantized_matmul_experts",
    "from_compressed_state",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedTensor:
    """A weight in compressed form + everything needed to use it in a matmul.

    Array fields are pytree leaves; `format`, `shape` and `scheme` are static
    (hashable) metadata so jit specializes per layer scheme.
    """

    # array leaves (any may be None)
    weight: Optional[jnp.ndarray] = None          # dense/naive repr
    weight_packed: Optional[jnp.ndarray] = None   # int32 or uint8 packed repr
    scale: Optional[jnp.ndarray] = None
    zero_point: Optional[jnp.ndarray] = None
    g_idx: Optional[jnp.ndarray] = None
    global_scale: Optional[jnp.ndarray] = None
    input_global_scale: Optional[jnp.ndarray] = None
    bias: Optional[jnp.ndarray] = None
    # sparse leaves
    sparse_values: Optional[jnp.ndarray] = None
    sparse_bitmask: Optional[jnp.ndarray] = None

    # engine-layout leaves for the fused Pallas kernels (built by
    # prepare_for_kernels at load time; never serialized)
    kernel_packed: Optional[jnp.ndarray] = None
    kernel_scales: Optional[jnp.ndarray] = None
    kernel_zp: Optional[jnp.ndarray] = None
    # g_idx (actorder) checkpoints: load-time column permutation that makes
    # quant groups contiguous so the fused kernels apply; the matmul
    # gathers x by this before the kernel (one lane shuffle instead of the
    # dequantize-to-bf16 fallback)
    kernel_perm: Optional[jnp.ndarray] = None

    # static metadata
    format: str = dataclasses.field(
        default=CompressionFormat.dense.value,
        metadata=dict(static=True),
    )
    shape: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    scheme: Any = dataclasses.field(default=None, metadata=dict(static=True))
    kernel_meta: Any = dataclasses.field(default=None,
                                         metadata=dict(static=True))

    @property
    def out_features(self) -> int:
        return self.shape[0]

    @property
    def in_features(self) -> int:
        return self.shape[1]


def _scheme_key(scheme: QuantizationScheme | None) -> str:
    # QuantizationScheme is pydantic (unhashable by default); use its json
    return scheme.model_dump_json() if scheme is not None else ""


def from_compressed_state(
    state: dict[str, jnp.ndarray],
    scheme: QuantizationScheme | None,
    format: str | CompressionFormat | None = None,
) -> QuantizedTensor:
    """Build a QuantizedTensor from a per-module compressed state dict as
    loaded from a checkpoint."""
    fmt = format or (scheme.format if scheme is not None else None)
    fmt = CompressionFormat(fmt).value if fmt is not None else None

    # sparse-stacked states keep their sparse leaves alongside
    sparse_values = state.get("weight.compressed")
    sparse_bitmask = state.get("weight.bitmask")
    sparse_shape = state.get("weight.shape")

    weight = state.get("weight")
    weight_packed = state.get("weight_packed")

    if fmt is None:
        if weight_packed is not None:
            fmt = (
                CompressionFormat.pack_quantized.value
                if weight_packed.dtype == jnp.int32
                else CompressionFormat.nvfp4_pack_quantized.value
            )
        elif weight is not None and (
            np.dtype(weight.dtype).kind in "iu"
            or str(weight.dtype).startswith("float8")
        ):
            fmt = CompressionFormat.naive_quantized.value
        else:
            fmt = CompressionFormat.dense.value

    if "weight_shape" in state:
        shape = tuple(int(v) for v in np.asarray(state["weight_shape"]))
    elif sparse_shape is not None:
        shape = tuple(int(v) for v in np.asarray(sparse_shape))
    elif weight is not None:
        shape = tuple(weight.shape)
    elif weight_packed is not None and fmt in (
        CompressionFormat.nvfp4_pack_quantized.value,
        CompressionFormat.mxfp4_pack_quantized.value,
    ):
        shape = (*weight_packed.shape[:-1], weight_packed.shape[-1] * 2)
    elif weight_packed is not None:
        shape = tuple(weight_packed.shape)
    else:
        shape = ()

    return QuantizedTensor(
        weight=weight,
        weight_packed=weight_packed,
        scale=state.get("weight_scale"),
        zero_point=state.get("weight_zero_point"),
        g_idx=state.get("weight_g_idx"),
        global_scale=state.get("weight_global_scale"),
        input_global_scale=state.get("input_global_scale"),
        bias=state.get("bias"),
        sparse_values=sparse_values,
        sparse_bitmask=sparse_bitmask,
        format=fmt,
        shape=shape,
        scheme=scheme,
    )


def permute_output_rows(qt: QuantizedTensor, perm) -> QuantizedTensor:
    """Reorder the output features of a compressed weight: row i of the
    result is row perm[i] of the input, for every per-output-row leaf.

    Used by the loader to convert checkpoint conventions at load time (e.g.
    DeepSeek's interleaved rope layout -> the engine's half-rotation layout)
    without touching the quantized representation: int32/uint8 packing is
    along the input dim, so output rows permute freely; per-row scales and
    zero points follow; g_idx indexes input columns and is untouched.
    """
    import numpy as _np

    from compressed_tensors_tpu.ops.pack import (
        pack_to_int32,
        unpack_from_int32,
    )

    perm = _np.asarray(perm)
    n_out = qt.shape[0] if qt.shape else None
    if n_out is None or len(perm) != n_out:
        raise ValueError(f"perm length {len(perm)} != out_features {n_out}")
    if qt.sparse_values is not None:
        raise NotImplementedError(
            "output-row permutation of bitmask-sparse weights"
        )
    if qt.kernel_packed is not None:
        raise ValueError("permute before prepare_for_kernels")

    rep = {}
    for field in ("weight", "weight_packed", "bias"):
        leaf = getattr(qt, field)
        if leaf is not None:
            rep[field] = leaf[perm]
    scale = qt.scale
    if scale is not None and scale.ndim >= 1 and scale.shape[0] == n_out:
        rep["scale"] = scale[perm]
    zp = qt.zero_point
    if zp is not None:
        if zp.dtype == jnp.int32:
            # packed along the output dim (packed_dim=0): unpack -> permute
            # -> repack
            num_bits = qt.scheme.weights.num_bits
            zp_shape = (n_out, zp.shape[-1])
            unpacked = unpack_from_int32(zp, num_bits, zp_shape, packed_dim=0)
            rep["zero_point"] = pack_to_int32(unpacked[perm], num_bits,
                                              packed_dim=0)
        elif zp.ndim >= 1 and zp.shape[0] == n_out:
            rep["zero_point"] = zp[perm]
    return dataclasses.replace(qt, **rep)


# --------------------------------------------------------------------------- #
# dense weight materialization (jnp fallback path)

def materialize_weight(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dequantize the compressed representation to a dense (N, K) weight.

    This is the XLA-fallback path; the Pallas kernels avoid ever writing the
    dense weight to HBM.
    """
    from compressed_tensors_tpu.ops.bitmask import sparse24_decompress

    fmt = qt.format
    weights_args = qt.scheme.weights if qt.scheme is not None else None

    # sparse layer: scatter values back to dense first
    if qt.sparse_values is not None:
        dense_q = sparse24_decompress(qt.sparse_values, qt.sparse_bitmask,
                                      qt.shape)
        if weights_args is not None and (
            np.dtype(dense_q.dtype).kind in "iu"
            or str(dense_q.dtype).startswith("float8")
        ):
            w = dequantize(dense_q, qt.scale, qt.zero_point, weights_args,
                           g_idx=qt.g_idx, dtype=dtype)
        else:
            w = dense_q.astype(dtype)
        return w

    if fmt == CompressionFormat.dense.value or (
        qt.weight is not None
        and np.dtype(qt.weight.dtype).kind == "f"
        and not str(qt.weight.dtype).startswith("float8")
    ) or (qt.weight is not None and qt.weight.dtype == jnp.bfloat16):
        return qt.weight.astype(dtype)

    if fmt == CompressionFormat.pack_quantized.value:
        num_bits = weights_args.num_bits
        unpacked = unpack_from_int32(qt.weight_packed, num_bits, qt.shape)
        zero_point = qt.zero_point
        if zero_point is not None and zero_point.dtype == jnp.int32:
            zp_shape = (*qt.shape[:-1], qt.scale.shape[-1])
            zero_point = unpack_from_int32(zero_point, num_bits, zp_shape,
                                           packed_dim=0)
        return dequantize(unpacked, qt.scale, zero_point, weights_args,
                          g_idx=qt.g_idx, dtype=dtype)

    if fmt in (
        CompressionFormat.nvfp4_pack_quantized.value,
        CompressionFormat.mxfp4_pack_quantized.value,
    ):
        m, half_n = qt.weight_packed.shape
        values = unpack_fp4_from_uint8(qt.weight_packed, m, half_n * 2,
                                       dtype=dtype)
        scale = qt.scale
        if scale.dtype == jnp.uint8:  # MX E8M0
            scale = decompress_mx_scale(scale).astype(dtype)
        else:
            scale = scale.astype(dtype)
        return dequantize(values, scale, None, weights_args,
                          global_scale=qt.global_scale, dtype=dtype)

    if fmt in (
        CompressionFormat.naive_quantized.value,
        CompressionFormat.int_quantized.value,
        CompressionFormat.float_quantized.value,
        CompressionFormat.mxfp8_quantized.value,
    ):
        scale = qt.scale
        if scale is not None and scale.dtype == jnp.uint8:  # MXFP8 E8M0
            scale = decompress_mx_scale(scale).astype(dtype)
        return dequantize(qt.weight, scale, qt.zero_point, weights_args,
                          g_idx=qt.g_idx, dtype=dtype)

    raise NotImplementedError(f"materialize_weight for format {fmt}")


# --------------------------------------------------------------------------- #
# fused-kernel preparation

def prepare_for_kernels(qt: QuantizedTensor) -> QuantizedTensor:
    """Repack a checkpoint-layout weight into the fused-kernel layout.

    Covers:
    - W4A16 pack_quantized (group strategy, no actorder) -> fused
      dequant+matmul kernel
    - W8A8 int8 / FP8 (channel or tensor weight scales + dynamic token
      acts) -> fused act-quant + 8-bit MXU matmul kernel

    Layers no kernel serves keep the checkpoint representation and fall
    back to the XLA path.
    """
    from compressed_tensors_tpu.ops.kernels.w4a16_matmul import (
        choose_k_tile,
        padded_k,
        repack_w4_for_kernel,
        retile_groups,
    )

    weights_args = qt.scheme.weights if qt.scheme is not None else None
    input_args = qt.scheme.input_activations if qt.scheme is not None else None

    # ---- 2:4 sparse stacked over symmetric int quant (BASELINE config 4):
    # scatter the quantized values dense at load time and ride the dense
    # fused kernels. The TPU MXU has no structured-sparse mode, so the 2:4
    # win is storage/IO; at runtime the scattered zeros are q=0, which
    # dequantize to exactly 0 under a symmetric scheme. The sparse leaves
    # are dropped once the kernel layout is built (the kernel is the
    # runtime representation; serialization uses the checkpoint state).
    if (
        qt.sparse_values is not None
        and weights_args is not None
        and weights_args.type == "int"
        and weights_args.symmetric
        and len(qt.shape) == 2
    ):
        from compressed_tensors_tpu.ops.bitmask import sparse24_decompress
        from compressed_tensors_tpu.ops.pack import pack_to_int32

        dense_q = sparse24_decompress(qt.sparse_values, qt.sparse_bitmask,
                                      qt.shape)
        if weights_args.num_bits == 4:
            dense_qt = dataclasses.replace(
                qt, sparse_values=None, sparse_bitmask=None, weight=None,
                weight_packed=pack_to_int32(dense_q.astype(jnp.int8), 4),
                format=CompressionFormat.pack_quantized.value,
            )
        else:
            dense_qt = dataclasses.replace(
                qt, sparse_values=None, sparse_bitmask=None,
                weight=dense_q.astype(jnp.int8), weight_packed=None,
                format=CompressionFormat.int_quantized.value,
            )
        prepped = prepare_for_kernels(dense_qt)
        if prepped.kernel_packed is not None:
            return prepped
        return qt

    # ---- W8A8 (int8 / fp8) fused act-quant matmul ---------------------- #
    if (
        qt.weight is not None
        and (qt.weight.dtype == jnp.int8
             or str(qt.weight.dtype).startswith("float8"))
        and qt.sparse_values is None
        and weights_args is not None
        and weights_args.strategy in (QuantizationStrategy.CHANNEL.value,
                                      QuantizationStrategy.TENSOR.value)
        and input_args is not None
        and input_args.dynamic is True
        and input_args.symmetric
        and len(qt.shape) == 2
    ):
        from compressed_tensors_tpu.ops.kernels.w8a8_matmul import (
            prepare_w8_weight,
            prepare_w8_weight_tiled,
        )

        n, k = qt.shape
        w_scale = qt.scale.astype(jnp.float32).reshape(1, -1)
        if w_scale.shape[-1] == 1 and n > 1:  # per-tensor -> broadcast row
            w_scale = jnp.broadcast_to(w_scale, (1, n))
        weight = qt.weight
        if (str(weight.dtype).startswith("float8")
                and _transcode_fp8_enabled()):
            # serve FP8 checkpoints at the int8 MXU rate on chips without a
            # native fp8 MXU (v5e): re-grid each output channel's exactly-
            # representable fp8 values onto the int8 lattice and fold the
            # per-channel rescale into weight_scale. The checkpoint leaves
            # (qt.weight/qt.scale) stay fp8 — only the kernel layout is
            # transcoded; KV-cache k_scale/v_scale semantics are untouched.
            wf = weight.astype(jnp.float32)
            absmax = jnp.maximum(
                jnp.max(jnp.abs(wf), axis=1, keepdims=True), 1e-12
            )  # (N, 1)
            weight = jnp.round(wf * (127.0 / absmax)).astype(jnp.int8)
            w_scale = w_scale * (absmax.reshape(1, -1) / 127.0)
        # pre-tile to (N/tn, K, tn) so every kernel weight block is one
        # contiguous DMA (the flat (K, N) layout pays K strided tn-byte
        # bursts per tile); only tiny weights stay flat
        packed = (prepare_w8_weight_tiled(weight) if n >= 1024
                  else prepare_w8_weight(weight))
        return dataclasses.replace(
            qt,
            kernel_packed=packed,
            kernel_scales=w_scale,
            kernel_meta=("w8a8", n, k),
        )

    # ---- NVFP4 / MXFP4 fused dequant matmul ---------------------------- #
    if (
        qt.format in (
            CompressionFormat.nvfp4_pack_quantized.value,
            CompressionFormat.mxfp4_pack_quantized.value,
        )
        and weights_args is not None
        and weights_args.num_bits == 4
        and weights_args.strategy in (QuantizationStrategy.GROUP.value,
                                      QuantizationStrategy.TENSOR_GROUP.value)
        and len(qt.shape) == 2
        and qt.weight_packed is not None
        and qt.shape[1] % (weights_args.group_size or 1) == 0
    ):
        from compressed_tensors_tpu.ops.kernels.w4a16_matmul import (
            repack_w4_for_kernel,
        )

        n, k = qt.shape
        group_size = weights_args.group_size  # 16 (nvfp4) / 32 (mxfp4)
        # the fp4 kernel does one full-depth dot per k-tile: deepen TK up
        # to 512 in multiples of 8*group_size (so nibble planes cover
        # whole groups)
        tk = 8 * group_size
        while tk * 2 <= min(512, k):
            tk *= 2
        k_pad = int(np.ceil(k / tk) * tk)

        wp = qt.weight_packed  # (N, K/2) uint8, low nibble first
        low = (wp & 0x0F).astype(jnp.int32)
        high = (wp >> 4).astype(jnp.int32)
        codes = jnp.stack([low, high], axis=-1).reshape(n, k)
        if k_pad != k:
            # code 0 decodes to +0.0: padded columns contribute exactly 0
            codes = jnp.pad(codes, ((0, 0), (0, k_pad - k)))
        kernel_packed = repack_w4_for_kernel(codes, 4, k_pad, tk)

        scale = qt.scale
        if scale.dtype == jnp.uint8:  # MX E8M0
            scale = decompress_mx_scale(scale)
        scale = scale.astype(jnp.float32)
        if qt.global_scale is not None:
            scale = scale / qt.global_scale.astype(jnp.float32).reshape(())
        scales = scale.T  # (K/g, N), k-order (no plane retiling for fp4)
        g_pad = k_pad // group_size - scales.shape[0]
        if g_pad:
            scales = jnp.pad(scales, ((0, g_pad), (0, 0)))

        return dataclasses.replace(
            qt,
            kernel_packed=kernel_packed,
            kernel_scales=scales,
            kernel_meta=("fp4", n, k, k_pad, group_size, tk),
        )

    # ---- WnA16 fused dequant matmul ------------------------------------ #
    if (
        qt.format != CompressionFormat.pack_quantized.value
        or weights_args is None
        or weights_args.num_bits not in (2, 3, 4, 5, 6, 7, 8)
        or weights_args.strategy
        not in (QuantizationStrategy.GROUP.value,)
        or len(qt.shape) != 2
    ):
        return qt

    n, k = qt.shape
    num_bits = weights_args.num_bits
    group_size = weights_args.group_size
    tk = choose_k_tile(k, group_size)
    k_pad = padded_k(k, group_size)
    if k % group_size != 0:
        return qt

    unpacked = unpack_from_int32(qt.weight_packed, num_bits,
                                 qt.shape)  # int8/int16

    kernel_perm = None
    if qt.g_idx is not None:
        # actorder (g_idx) checkpoints: permute weight columns at load so
        # quant groups are contiguous (scale column j already belongs to
        # group j); the matmul gathers x by the same permutation at
        # runtime — one lane shuffle replaces the reference's argsort
        # inside every QDQ (ref forward_helpers.py:118-177) AND keeps the
        # fused kernel instead of the dequantize fallback
        order = jnp.argsort(qt.g_idx.astype(jnp.int32), stable=True)
        unpacked = jnp.take(unpacked, order, axis=1)
        kernel_perm = order.astype(jnp.int32)

    if num_bits != 4:
        # non-4-bit WnA16 (W2..W8A16 presets): expand to signed int8
        # k-major and ride the grouped-int8 kernel (`w4_e8_matmul` is
        # value-generic: per-group depth dots on int8 values, scale on the
        # out tile). 1 byte/elem HBM vs the 2 bytes/elem of the XLA
        # dequantize-to-bf16 fallback these widths used before. Per-group
        # zero points fold into the stored values (q - zp fits int8 for
        # widths < 8; 8-bit asym stays on the fallback).
        q = unpacked.astype(jnp.int32)
        if qt.zero_point is not None:
            if num_bits >= 8:
                return qt
            zp = qt.zero_point
            if zp.dtype == jnp.int32:  # checkpoint packed_dim=0 packing
                zp_shape = (n, qt.scale.shape[-1])
                zp = unpack_from_int32(zp, num_bits, zp_shape,
                                       packed_dim=0)
            q = q - jnp.repeat(zp.astype(jnp.int32), group_size, axis=1)
        w8 = q.astype(jnp.int8).T  # (K, N)
        if k_pad != k:
            w8 = jnp.pad(w8, ((0, k_pad - k), (0, 0)))
        scales = qt.scale.astype(jnp.float32).T  # (K/g, N)
        g_pad = k_pad // group_size - scales.shape[0]
        if g_pad:
            scales = jnp.pad(scales, ((0, g_pad), (0, 0)))
        return dataclasses.replace(
            qt,
            kernel_packed=w8,
            kernel_scales=scales,
            kernel_perm=kernel_perm,
            kernel_meta=("w4e8", n, k, k_pad, group_size, tk),
        )

    # layout choice: "e8" expands to signed int8 k-major (1 convert/elem in
    # the kernel instead of nibble extraction — decode is VPU-bound on v5e)
    # at 2x the packed HBM bytes; "packed" keeps int4-in-int32. Symmetric
    # schemes only (e8 has no zero-point path). Resolved at load time
    # (prepare_for_kernels runs outside jit) from the one-shot flags.
    from compressed_tensors_tpu.flags import FLAGS

    layout = FLAGS.w4_layout
    if layout == "auto":
        # byte-packed b8 keeps the packed HBM traffic and cuts nibble
        # decode to two int8 AND ops per byte (measured: the 8B decode
        # GEMM chain went 6.52 -> 6.20 ms over the int32 plane layout,
        # and b8 is the layout the int8-MXU act path rides)
        layout = "b8"
    if layout == "b8":
        from compressed_tensors_tpu.ops.kernels.w4a16_matmul import (
            repack_w4_b8_tiled,
            retile_b8_scales,
        )

        u = unpacked.astype(jnp.int32) + 8
        if k_pad != k:
            # padded k-positions: u=8 (q=0) and scale=0 -> contribute 0
            u = jnp.pad(u, ((0, 0), (0, k_pad - k)), constant_values=8)
        # pre-tile with the least-padding tn <= 4096 (each weight block one
        # contiguous DMA stream) — EXCEPT single-column-tile weights with a
        # deep K (8B-scale down_proj): there the 3D block indexing measured
        # ~1 ms/step slower over the model chain, while wide-N and
        # shallow-K weights measured up to 25% faster tiled (chain A/Bs,
        # r5; TinyLlama 1.20 -> 0.90 ms, 8B 6.5 -> 6.35)
        nt = max(1, -(-n // 4096))
        tn = int(np.ceil(n / nt / 128) * 128)
        if nt > 1 or k_pad < 8192:
            kernel_packed = repack_w4_b8_tiled(u, k_pad, tk, tn)
        else:
            from compressed_tensors_tpu.ops.kernels.w4a16_matmul import (
                repack_w4_b8,
            )

            kernel_packed = repack_w4_b8(u, k_pad, tk)

        scales = qt.scale.astype(jnp.float32).T  # (K/g, N)
        g_pad = k_pad // group_size - scales.shape[0]
        if g_pad:
            scales = jnp.pad(scales, ((0, g_pad), (0, 0)))

        zp_f = None
        if qt.zero_point is not None:
            zp = qt.zero_point
            if zp.dtype == jnp.int32:  # checkpoint packed_dim=0 packing
                zp_shape = (n, qt.scale.shape[-1])
                zp = unpack_from_int32(zp, 4, zp_shape, packed_dim=0)
            zp_f = zp.astype(jnp.float32).T
            if g_pad:
                zp_f = jnp.pad(zp_f, ((0, g_pad), (0, 0)))
        kernel_scales, kernel_corr = retile_b8_scales(
            scales, zp_f, k_pad, tk, group_size)
        return dataclasses.replace(
            qt,
            kernel_packed=kernel_packed,
            kernel_scales=kernel_scales,
            kernel_zp=kernel_corr,  # corr coefficients ride the zp slot
            kernel_perm=kernel_perm,
            kernel_meta=("w4b8", n, k, k_pad, group_size, tk),
        )
    if layout == "e8" and qt.zero_point is None:
        w8 = unpacked.astype(jnp.int8).T  # (K, N) signed q
        if k_pad != k:
            w8 = jnp.pad(w8, ((0, k_pad - k), (0, 0)))
        scales = qt.scale.astype(jnp.float32).T  # (K/g, N)
        g_pad = k_pad // group_size - scales.shape[0]
        if g_pad:
            scales = jnp.pad(scales, ((0, g_pad), (0, 0)))
        return dataclasses.replace(
            qt,
            kernel_packed=w8,
            kernel_scales=scales,
            kernel_perm=kernel_perm,
            kernel_meta=("w4e8", n, k, k_pad, group_size, tk),
        )

    u = unpacked.astype(jnp.int32) + 8
    if k_pad != k:
        # padded k-positions: u=8 (q=0) and scale=0 -> contribute exactly 0
        u = jnp.pad(u, ((0, 0), (0, k_pad - k)), constant_values=8)
    kernel_packed = repack_w4_for_kernel(u, 4, k_pad, tk)

    # kernel layout stores scales/zp K-major: (K_pad/g, N)
    scales = qt.scale.astype(jnp.float32).T
    g_pad = k_pad // group_size - scales.shape[0]
    if g_pad:
        scales = jnp.pad(scales, ((0, g_pad), (0, 0)))
    scales = retile_groups(scales, k_pad, tk, group_size)

    kernel_zp = None
    if qt.zero_point is not None:
        zp = qt.zero_point
        if zp.dtype == jnp.int32:  # checkpoint packed_dim=0 packing
            zp_shape = (n, qt.scale.shape[-1])
            zp = unpack_from_int32(zp, 4, zp_shape, packed_dim=0)
        zp_t = zp.astype(jnp.int8).T
        if g_pad:
            zp_t = jnp.pad(zp_t, ((0, g_pad), (0, 0)))
        kernel_zp = retile_groups(zp_t, k_pad, tk, group_size)

    return dataclasses.replace(
        qt,
        kernel_packed=kernel_packed,
        kernel_scales=scales,
        kernel_zp=kernel_zp,
        kernel_perm=kernel_perm,
        kernel_meta=("w4a16", n, k, k_pad, group_size, tk),
    )


def _kernel_enabled() -> bool:
    from compressed_tensors_tpu.flags import FLAGS

    if FLAGS.enforce_eager:
        return False
    return jax.default_backend() == "tpu" or FLAGS.pallas_interpret


def _transcode_fp8_enabled() -> bool:
    """Whether fp8 weights should be re-gridded to int8 at load.

    "auto": yes on TPU (current deployment target v5e has no native fp8
    MXU, so fp8 matmuls run emulated via upconversion at a fraction of the
    int8 rate); set "never" on fp8-native parts."""
    from compressed_tensors_tpu.flags import FLAGS

    mode = FLAGS.fp8_transcode
    if mode == "always":
        return True
    if mode == "never":
        return False
    return jax.default_backend() == "tpu"


# --------------------------------------------------------------------------- #
# matmul dispatch

def _int8_dynamic_matmul(x, qt: QuantizedTensor, input_args):
    """W8A8-int path: dynamic per-token act quant + int8 MXU matmul +
    rescale. Weight scale is per-channel (N, 1) or per-tensor."""
    x_scale, _ = compute_dynamic_scales_and_zp(x, input_args)
    x_q = quantize(x, x_scale, None, input_args, dtype=jnp.int8)
    acc = jax.lax.dot_general(
        x_q, qt.weight,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    w_scale = qt.scale.reshape(-1).astype(jnp.float32)  # (N,)
    out = acc.astype(jnp.float32) * x_scale.astype(jnp.float32) * w_scale
    return out.astype(x.dtype)


def _fp8_matmul(x, qt: QuantizedTensor, input_args):
    """FP8 W8A8 path: act quant to fp8 (static or dynamic scale), fp8 MXU
    matmul with fp32 accumulation + rescale."""
    if input_args is not None and input_args.dynamic is True:
        x_scale, _ = compute_dynamic_scales_and_zp(x, input_args)
    else:
        x_scale = None

    w = qt.weight
    w_scale = qt.scale.astype(jnp.float32)
    if x_scale is not None:
        x_q = quantize(x, x_scale, None, input_args,
                       dtype=w.dtype)
        acc = jax.lax.dot_general(
            x_q, w,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = acc * x_scale.astype(jnp.float32) * w_scale.reshape(-1)
        return out.astype(x.dtype)
    # weight-only fp8: dequantize into matmul
    w_dense = dequantize(w, qt.scale, None, qt.scheme.weights,
                         dtype=x.dtype)
    return jax.lax.dot_general(
        x, w_dense,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def stack_quantized_tensors(qts: list[QuantizedTensor]) -> QuantizedTensor:
    """Stack per-expert QuantizedTensors into one with a leading expert dim
    (the reference's slice-wise 3D layout,
    ref compressors/pack_quantized/helpers.py:44-51). All experts must share
    scheme/format/shape."""
    for qt in qts[1:]:
        if qt.format != qts[0].format or qt.shape != qts[0].shape:
            raise ValueError("experts must share format and shape to stack")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
    return dataclasses.replace(stacked, shape=(len(qts), *qts[0].shape))



def _w4b8_mode(m_rows: int, n: int, k: int) -> str:
    """Activation-precision mode for the b8 layout (see flags.w4_act)."""
    from compressed_tensors_tpu.flags import FLAGS

    if FLAGS.w4_act == "int8":
        return "a8b"
    if FLAGS.w4_act == "bf16":
        return "int4b"
    return ("a8b" if m_rows >= 256 and n >= 4096 and k >= 4096
            else "int4b")


def prepare_experts_for_kernels(qt: QuantizedTensor) -> QuantizedTensor:
    """Stacked-expert (3D) analogue of prepare_for_kernels: prepare each
    expert slice and restack the kernel leaves, so the batched expert
    matmul can vmap the fused WnA16 kernels over the expert dim instead of
    materializing every expert dense in bf16. Formats without a stackable
    kernel layout (w8a8 runs natively batched on the int8/fp8 MXU) return
    unchanged."""
    if qt.kernel_packed is not None or len(qt.shape) != 3:
        return qt
    E = qt.shape[0]
    fields = ("weight", "weight_packed", "scale", "zero_point", "g_idx",
              "global_scale", "input_global_scale", "bias")

    def expert(e):
        rep = {f: (getattr(qt, f)[e] if getattr(qt, f) is not None
                   else None) for f in fields}
        return dataclasses.replace(qt, shape=tuple(qt.shape[1:]), **rep)

    prepped = [prepare_for_kernels(expert(e)) for e in range(E)]
    first = prepped[0]
    if first.kernel_packed is None or first.kernel_meta is None:
        return qt
    if first.kernel_meta[0] not in ("w4b8", "w4e8"):
        return qt
    if any(p.kernel_perm is not None for p in prepped):
        return qt  # actorder experts stay on the fallback
    stacked = stack_quantized_tensors(prepped)
    return dataclasses.replace(stacked, shape=qt.shape)


def quantized_matmul_experts(x: jnp.ndarray, qt: QuantizedTensor) -> jnp.ndarray:
    """Batched expert matmul: y[e] = x[e] @ W[e]^T for stacked expert weights.

    `x` is the (E, C, K) dispatch buffer; `qt`'s array leaves carry a leading
    expert dim (the reference's slice-wise-packed 3D MoE layout,
    ref compressors/pack_quantized/helpers.py:44-51). Dispatches like
    `quantized_matmul`:
    - int8 weights + dynamic token acts: batched int8 MXU matmul
    - fp8 weights + dynamic acts: batched fp8 MXU matmul
    - everything else: batched dequant (XLA-fused) + bf16 matmul
    """
    scheme = qt.scheme
    input_args = scheme.input_activations if scheme is not None else None
    weights_args = scheme.weights if scheme is not None else None
    E, C, K = x.shape
    batched_dims = (((2,), (2,)), ((0,), (0,)))

    if (
        qt.kernel_packed is not None
        and qt.kernel_meta is not None
        and qt.kernel_meta[0] in ("w4b8", "w4e8")
        and _kernel_enabled()
    ):
        # stacked WnA16 kernel layouts (prepare_experts_for_kernels):
        # vmap the fused kernel over the expert dim — weights stay packed
        # in HBM instead of materializing E dense bf16 experts per call
        kind, n, k, k_pad, group_size, tk = qt.kernel_meta
        if kind == "w4b8":
            from compressed_tensors_tpu.ops.kernels.w4a16_matmul import (
                w4a16_matmul,
            )

            mode = _w4b8_mode(C, n, k)
            out = jax.vmap(lambda xe, w, s, c: w4a16_matmul(
                xe, w, s, c, n=n, k=k_pad, group_size=group_size, tk=tk,
                out_dtype=x.dtype, mode=mode,
            ))(x, qt.kernel_packed, qt.kernel_scales, qt.kernel_zp)
        else:
            from compressed_tensors_tpu.ops.kernels.w4a16_matmul import (
                w4_e8_matmul,
            )

            out = jax.vmap(lambda xe, w, s: w4_e8_matmul(
                xe, w, s, n=n, k=k_pad, group_size=group_size, tk=tk,
                out_dtype=x.dtype,
            ))(x, qt.kernel_packed, qt.kernel_scales)
        if qt.bias is not None:
            out = out + qt.bias.astype(out.dtype)[:, None, :]
        return out

    use_int8 = (
        qt.weight is not None
        and qt.weight.dtype == jnp.int8
        and qt.sparse_values is None
        and input_args is not None
        and input_args.dynamic is True
        and input_args.type == "int"
        and input_args.num_bits == 8
        and weights_args is not None
        and weights_args.strategy
        in (QuantizationStrategy.CHANNEL.value, QuantizationStrategy.TENSOR.value)
    )
    use_fp8 = (
        qt.weight is not None
        and str(qt.weight.dtype).startswith("float8")
        and qt.sparse_values is None
        and input_args is not None
        and input_args.dynamic is True
        and input_args.num_bits == 8
        and input_args.type == "float"
        and weights_args is not None
        and weights_args.strategy
        in (QuantizationStrategy.CHANNEL.value, QuantizationStrategy.TENSOR.value)
    )

    if use_int8 or use_fp8:
        x_scale, _ = compute_dynamic_scales_and_zp(x, input_args)  # (E, C, 1)
        q_dtype = qt.weight.dtype
        acc_dtype = jnp.int32 if use_int8 else jnp.float32
        x_q = quantize(x, x_scale, None, input_args, dtype=q_dtype)
        acc = jax.lax.dot_general(
            x_q, qt.weight, dimension_numbers=batched_dims,
            preferred_element_type=acc_dtype,
        )  # (E, C, N)
        # weight scale: (E, N, 1) channel or (E, 1) tensor -> (E, 1, N)
        w_scale = qt.scale.astype(jnp.float32).reshape(E, 1, -1)
        out = acc.astype(jnp.float32) * x_scale.astype(jnp.float32) * w_scale
        return out.astype(x.dtype)

    w = materialize_weight(qt, dtype=x.dtype)  # (E, N, K)
    out_dtype = x.dtype
    if jax.default_backend() != "tpu" and x.dtype == jnp.bfloat16:
        # CPU XLA lacks batched bf16xbf16->f32 dot thunks
        x, w = x.astype(jnp.float32), w.astype(jnp.float32)
    out = jax.lax.dot_general(
        x, w, dimension_numbers=batched_dims,
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)
    if qt.bias is not None:
        out = out + qt.bias.astype(out.dtype)[:, None, :]
    return out


def quantized_matmul(
    x: jnp.ndarray,
    qt: QuantizedTensor,
    use_kernels: bool | None = None,
) -> jnp.ndarray:
    """y = x @ W^T (+ bias) with W in compressed form.

    Dispatches per format/scheme:
    - W8A8-int (channel weights + dynamic token acts): int8 MXU matmul
    - FP8 W8A8: fp8 MXU matmul
    - packed/fp4/dense and everything else: dequant (fused by XLA or Pallas)
      then bf16 matmul

    :param use_kernels: route through the fused Pallas kernel layouts when
        available. None (default) falls back to the environment/backend
        default (`_kernel_enabled()`), which is read at TRACE time — pass an
        explicit bool from jitted callers that need a stable choice.
    """
    if use_kernels is None:
        use_kernels = _kernel_enabled()
    scheme = qt.scheme
    input_args = scheme.input_activations if scheme is not None else None
    weights_args = scheme.weights if scheme is not None else None

    use_int8_path = (
        qt.weight is not None
        and qt.weight.dtype == jnp.int8
        and qt.sparse_values is None
        and input_args is not None
        and input_args.dynamic is True
        and input_args.type == "int"
        and input_args.num_bits == 8
        and weights_args is not None
        and weights_args.strategy
        in (QuantizationStrategy.CHANNEL.value, QuantizationStrategy.TENSOR.value)
    )
    use_fp8_path = (
        qt.weight is not None
        and str(qt.weight.dtype).startswith("float8")
        and qt.sparse_values is None
        and input_args is not None
        and input_args.num_bits == 8
        and input_args.type == "float"
        and weights_args is not None
        and weights_args.strategy
        in (QuantizationStrategy.CHANNEL.value, QuantizationStrategy.TENSOR.value)
    )

    if qt.kernel_packed is not None and use_kernels:
        from compressed_tensors_tpu.flags import FLAGS

        lead = x.shape[:-1]
        m_rows = 1
        for d in lead:
            m_rows *= int(d)
        if (
            qt.kernel_meta[0] in ("w4a16", "w4b8", "w4e8")
            and FLAGS.w4_act != "int8"
            and FLAGS.w4_dense_m > 0
            and m_rows >= FLAGS.w4_dense_m
            and qt.weight_packed is not None
        ):
            # prefill-scale M: dequantize the weight ONCE to bf16 (XLA
            # fuses unpack+dequant into the operand producer) and run the
            # dense MXU dot at its full bf16 rate — the fused kernel's
            # in-loop nibble decode caps it at ~150 TF/s vs ~183 dense
            # (the reference's decompress-then-forward semantics,
            # ref model_compressor.py:246-260, applied per call shape).
            # The int8-act mode skips this: its fused rate already
            # matches the dense path without the dequant HBM round trip.
            w = materialize_weight(qt, dtype=x.dtype)
            out = jax.lax.dot_general(
                x, w,
                dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            if qt.bias is not None:
                out = out + qt.bias.astype(out.dtype)
            return out
        if qt.kernel_perm is not None:
            # actorder layout: gather x columns into the group-contiguous
            # order the kernel weights were repacked in (load-time perm)
            x = jnp.take(x, qt.kernel_perm, axis=-1)
        if qt.kernel_meta[0] == "w8a8":
            from compressed_tensors_tpu.ops.kernels.w8a8_matmul import (
                w8a8_matmul,
            )

            kind, n, k = qt.kernel_meta
            out = w8a8_matmul(
                x.reshape(-1, k), qt.kernel_packed, qt.kernel_scales,
                n=n, k=k, out_dtype=x.dtype,
            ).reshape(*lead, n)
        elif qt.kernel_meta[0] == "w4e8":
            from compressed_tensors_tpu.ops.kernels.w4a16_matmul import (
                w4_e8_matmul,
            )

            kind, n, k, k_pad, group_size, tk = qt.kernel_meta
            out = w4_e8_matmul(
                x.reshape(-1, k), qt.kernel_packed, qt.kernel_scales,
                n=n, k=k_pad, group_size=group_size, tk=tk,
                out_dtype=x.dtype,
            ).reshape(*lead, n)
        else:
            from compressed_tensors_tpu.flags import FLAGS
            from compressed_tensors_tpu.ops.kernels.w4a16_matmul import (
                w4a16_matmul,
            )

            kind, n, k, k_pad, group_size, tk = qt.kernel_meta
            if kind == "fp4":
                mode = "fp4"
            elif kind == "w4b8":
                # int8-MXU act quant at prefill row counts for 8B-class
                # matmul dims (measured: 8B prefill chain -30%, TTFT
                # 253 -> 232 ms; NLL delta vs bf16 execution 1.5e-4,
                # bench.py). Small dims lose: the act-quant producer work
                # outweighs the int8-MXU gain, and at decode rows the
                # per-matmul quant launches dominate.
                mode = _w4b8_mode(m_rows, n, k)
            out = w4a16_matmul(
                x.reshape(-1, k), qt.kernel_packed, qt.kernel_scales,
                qt.kernel_zp,
                n=n, k=k_pad, group_size=group_size, tk=tk,
                out_dtype=x.dtype,
                mode=mode,
            ).reshape(*lead, n)
    elif use_int8_path:
        out = _int8_dynamic_matmul(x, qt, input_args)
    elif use_fp8_path:
        out = _fp8_matmul(x, qt, input_args)
    else:
        w = materialize_weight(qt, dtype=x.dtype)
        out = jax.lax.dot_general(
            x, w,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    if qt.bias is not None:
        out = out + qt.bias.astype(out.dtype)
    return out
