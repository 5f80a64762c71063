"""Fused W4A16 dequant+matmul Pallas kernels.

Replaces the reference's delegate-to-vLLM seam (`linear/compressed_linear.py`)
with TPU-native kernels: 4-bit weights stay packed in HBM, are decoded in
VMEM inside the matmul pipeline, and never materialize as bf16 in HBM. The
shared structure across layouts: per k-tile, the dot runs on *raw
offset-unsigned nibbles* per quant group and the affine dequant applies
AFTER the dots as one low-rank MXU correction:

    y_j = s_j * (x_j @ u_j) - s_j * (8 + zp_j) * sum(x_j)

(u = q + 8 stored unsigned); all per-group terms collapse into a single
(TB, gpt) @ (gpt, TN) dot of precomputed coefficients.

Layouts / modes (docs/kernels.md derives the measurements):

- **b8 byte layout** (default; modes "int4b" bf16-MXU / "a8b" int8-MXU):
  nibble pairs in int8 bytes — low nibble = k-position s of the tile, high
  nibble = k-position tk/2 + s with its MSB flipped so that
  ``(byte & 0xF0)`` as signed int8 equals exactly ``16*u_hi - 128``.
  Decode is two int8 AND ops per byte at packed-byte lane density (Mosaic
  legalizes no i8 vector shifts); the 1/16 and the offset fold into the
  retiled scales/correction (`retile_b8_scales`). Optionally pre-tiled to
  (N/tn, K/2, tn) for contiguous block DMAs (`repack_w4_b8_tiled`).
- **int32 plane layout** (modes "int4"/"a8"/"mat"): TK = 8*group_size, one
  quant group per nibble plane of each int32 word; decode is
  shift+mask+convert per plane.
- **e8**: int4 pre-expanded to signed int8 k-major (2x HBM bytes, zero
  nibble work) — A/B fallback.
- mode "fp4": E2M1 codes decoded in-register for the NVFP4/MXFP4 formats.
- modes "a8"/"a8b" quantize activations per token to int8 on entry and run
  the dots on the 2x-rate int8 MXU (execution-precision opt-in, NLL delta
  ~2e-4 measured; `w4_act=auto` uses it at prefill row counts).

All modes accumulate in an f32 VMEM scratch and write the out block once,
in its final dtype, on the last k step. K is zero-padded to a multiple of
TK at load time (padded groups get scale 0, so they contribute exactly 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "repack_w4_for_kernel",
    "w4a16_matmul",
    "w4_e8_matmul",
    "choose_k_tile",
    "retile_groups",
    "rows_per_tile",
    "padded_k",
]

PLANES = 8  # nibbles per int32


def _interpret() -> bool:
    # load-time-resolved flag (never an env read at trace time)
    from compressed_tensors_tpu.flags import FLAGS

    if FLAGS.pallas_interpret:
        return True
    return jax.default_backend() not in ("tpu",)


def choose_k_tile(K: int, group_size: int) -> int:
    """TK = 8 * group_size (one quant group per nibble plane)."""
    return PLANES * group_size


def padded_k(K: int, group_size: int) -> int:
    tk = choose_k_tile(K, group_size)
    return int(np.ceil(K / tk) * tk)


def rows_per_tile(tk: int, group_size: int) -> int:
    """Sublane rows per K-tile for the re-tiled scale/zp operands (8 planes,
    already the sublane minimum)."""
    return PLANES


def retile_groups(scales_t: jnp.ndarray, k: int, tk: int,
                  group_size: int) -> jnp.ndarray:
    """(K/g, N) -> (K_tiles * 8, N): tile t's rows are its 8 group scales.
    Expects K already padded to a multiple of tk (pad groups -> scale 0)."""
    g_total, n = scales_t.shape
    tiles = k // tk
    assert g_total == tiles * PLANES, (g_total, tiles)
    return scales_t


@functools.partial(jax.jit, static_argnames=("num_bits", "k", "tk"))
def repack_w4_for_kernel(
    unpacked_u: jnp.ndarray, num_bits: int, k: int, tk: int
) -> jnp.ndarray:
    """Offset-unsigned values (N, K) in [0, 15] -> kernel layout (K/8, N).
    K must already be padded to a multiple of tk."""
    assert num_bits == 4
    n = unpacked_u.shape[0]
    wpt = tk // PLANES
    v = unpacked_u.T.astype(jnp.uint32).reshape(k // tk, PLANES, wpt, n)
    shifts = (4 * jnp.arange(PLANES, dtype=jnp.uint32))[None, :, None, None]
    words = jnp.sum(v << shifts, axis=1, dtype=jnp.uint32)  # (T, wpt, N)
    return jax.lax.bitcast_convert_type(words, jnp.int32).reshape(k // 8, n)


@functools.partial(jax.jit, static_argnames=("k", "tk"))
def repack_w4_b8(unpacked_u: jnp.ndarray, k: int, tk: int) -> jnp.ndarray:
    """Offset-unsigned values (N, K) in [0, 15] -> byte layout (K/2, N) int8.

    Within each k-tile of size tk, byte row s holds k-position s in its low
    nibble and k-position tk/2 + s in its high nibble — so the low-nibble
    plane is the tile's first tk/2 k-positions (groups 0..gpt/2-1) and the
    high plane the second half.

    The high nibble is stored with its MSB flipped (h' = u_hi XOR 8), so
    that the signed int8 value (byte & 0xF0) equals exactly 16*u_hi - 128
    for every u_hi in [0, 15]. Decode is then TWO int8 AND ops per byte
    (no shifts — Mosaic has no i8 vector shift — and no converts on the
    int8-MXU path), at packed-byte lane density: ~an order of magnitude
    less VPU work per element than the int32 8-plane extraction, for the
    same HBM bytes. The 1/16 rescale and the -128 offset fold into the
    per-plane kernel scales and the rank-8 affine correction
    (see retile_b8_scales).
    K must already be padded to a multiple of tk."""
    n = unpacked_u.shape[0]
    half = tk // 2
    v = unpacked_u.T.astype(jnp.uint8).reshape(k // tk, 2, half, n)
    bytes_ = v[:, 0] | ((v[:, 1] ^ 8) << 4)  # (T, half, N) uint8
    return jax.lax.bitcast_convert_type(bytes_, jnp.int8).reshape(k // 2, n)


@functools.partial(jax.jit, static_argnames=("k", "tk", "tn"))
def repack_w4_b8_tiled(
    unpacked_u: jnp.ndarray, k: int, tk: int, tn: int
) -> jnp.ndarray:
    """b8 byte layout pre-tiled to (N/tn, K/2, tn) so every kernel weight
    block is ONE contiguous (K/2 * tn)-byte DMA stream; the flat (K/2, N)
    layout pays K/2 strided tn-byte bursts per block (the same pre-tiling
    the w8a8 kernel uses, docs/kernels.md r4 notes). N pads to tn with
    u=8 columns (scale rows pad separately)."""
    flat = repack_w4_b8(unpacked_u, k, tk)  # (K/2, N)
    n = flat.shape[1]
    n_pad = int(np.ceil(n / tn) * tn)
    if n_pad != n:
        flat = jnp.pad(flat, ((0, 0), (0, n_pad - n)))
    return flat.reshape(k // 2, n_pad // tn, tn).transpose(1, 0, 2)


def retile_b8_scales(
    scales_t: jnp.ndarray,      # (K/g, N) f32, k-order, K padded
    zp_t: jnp.ndarray | None,   # (K/g, N) or None
    k: int,
    tk: int,
    group_size: int,
):
    """Kernel-side scale/correction operands for the b8 byte layout.

    Per k-tile the gpt = tk/group_size group rows split lo (first half) /
    hi (second half). The hi-plane dot returns
    d_v = x @ (16*u_hi - 128) = 16*(x@u_hi) - 128*sum(x), so with
    y_j = s_j*(x@u_j) - s_j*(8+zp_j)*sum(x):

      lo planes: scale s_j,     correction coefficient (8+zp_j)*s_j
      hi planes: scale s_j/16,  correction coefficient zp_j*s_j
                 (the -128 offset exactly cancels the u = q+8 offset)

    Returns (scales_kernel, corr_kernel), both (K/group_size, N) f32.
    """
    g_total, n = scales_t.shape
    tiles = k // tk
    gpt = tk // group_size
    assert g_total == tiles * gpt, (g_total, tiles, gpt)
    s = scales_t.astype(jnp.float32).reshape(tiles, gpt, n)
    zp = (jnp.zeros_like(s) if zp_t is None
          else zp_t.astype(jnp.float32).reshape(tiles, gpt, n))
    half = gpt // 2
    s_kernel = jnp.concatenate([s[:, :half], s[:, half:] / 16.0], axis=1)
    corr = jnp.concatenate(
        [(8.0 + zp[:, :half]) * s[:, :half], zp[:, half:] * s[:, half:]],
        axis=1,
    )
    return s_kernel.reshape(tiles * gpt, n), corr.reshape(tiles * gpt, n)


def _make_kernel(tk: int, group_size: int, has_zp: bool, mode: str = "int4",
                 num_k: int = 1):
    """mode "int4": offset-unsigned nibbles + rank-1 affine correction.
    mode "a8": same weight layout, but activations arrive pre-quantized to
    per-token int8 (scale via the trailing x-scale operand) so every plane
    dot runs on the 2x-rate int8 MXU — the only unit with headroom at
    decode row counts (a 64-row bf16 stream tops out near ~140 TFLOP/s on
    the 128x128 array; int8 doubles the per-pass rate).
    mode "fp4": E2M1 codes decoded in-register (sign/exp/mantissa selects,
    LUT 0,.5,1,1.5,2,3,4,6 — ref nvfp4/helpers.py KE2M1_TO_FLOAT) and a
    plain per-group scale multiply (no zero points in fp4 formats).

    All modes accumulate in a per-program f32 VMEM scratch and write the
    out block once, in its final dtype, on the last k step — the out HBM
    traffic is 2 bytes/element written once instead of an f32 write plus a
    downstream convert read."""

    def kernel(x_ref, wp_ref, scale_ref, *rest):
        rest = list(rest)
        acc_ref = rest.pop()
        out_ref = rest.pop()
        zp_ref = rest.pop() if has_zp else None
        xs_ref = rest.pop() if mode in ("a8", "a8b") else None
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def flush(value):
            acc_ref[:] += value

            @pl.when(ki == num_k - 1)
            def _():
                final = acc_ref[:]
                if xs_ref is not None:
                    final = final * xs_ref[:]
                out_ref[:] = final.astype(out_ref.dtype)

        x = x_ref[:]  # (TB, TK)
        compute = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

        if mode in ("int4b", "a8b"):
            # byte layout (see repack_w4_b8): decode is TWO int8 AND ops
            # per byte at packed-byte lane density. The lo planes dot the
            # raw low nibbles (0..15); the hi planes dot the signed
            # (byte & 0xF0) values (= 16*u_hi - 128) and the retiled
            # scales/correction coefficients absorb the 1/16 and the
            # offset (retile_b8_scales). corr rides the zp operand slot
            # and is always present for these modes.
            corr_ref = zp_ref
            w8 = wp_ref[:]  # (TK/2, TN) int8, or (1, TK/2, TN) pre-tiled
            if len(w8.shape) == 3:
                w8 = w8[0]
            gpt = tk // group_size
            acc = None
            for j in range(gpt):
                mask = jnp.int8(0xF) if j < gpt // 2 else jnp.int8(-16)
                r0 = (j % (gpt // 2)) * group_size
                # slice-then-mask keeps the decoded temporary at one
                # (group_size, TN) tile per dot instead of two full
                # (TK/2, TN) planes — halves the kernel's scoped-VMEM
                # stack and lets TN grow to a full weight row
                u_j = w8[r0 : r0 + group_size, :] & mask
                x_j = x[:, j * group_size : (j + 1) * group_size]
                s_j = scale_ref[j, :].astype(jnp.float32)
                if mode == "a8b":
                    partial = jax.lax.dot_general(
                        x_j, u_j,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                else:
                    partial = jax.lax.dot_general(
                        x_j.astype(compute), u_j.astype(compute),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                term = partial * s_j[None, :]
                acc = term if acc is None else acc + term

            if mode == "a8b":
                sum_x = jnp.sum(
                    x.astype(jnp.int32).reshape(
                        x.shape[0], gpt, group_size),
                    axis=2,
                ).astype(jnp.float32)
            else:
                sum_x = jnp.sum(
                    x.astype(jnp.float32).reshape(
                        x.shape[0], gpt, group_size),
                    axis=2,
                )
            corr = jax.lax.dot_general(
                sum_x, corr_ref[:].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            flush(acc - corr)
            return

        uw = jax.lax.bitcast_convert_type(wp_ref[:], jnp.uint32)  # (g, TN)

        if mode == "a8":
            # int8 MXU path: dot the raw int8 activations against the raw
            # offset-unsigned nibbles (exact int32 accumulation), apply the
            # group scale to the (TB, TN) partial, and fold the affine
            # offset in as the same rank-8 correction the bf16 path uses:
            #   y = s_x * [ sum_j s_j (xq_j @ u_j) - s_j (8+zp_j) sum(xq_j) ]
            acc = None
            for j in range(PLANES):
                u_j = (((uw >> jnp.uint32(4 * j)) & jnp.uint32(0xF))
                       .astype(jnp.int8))
                x_j = x[:, j * group_size : (j + 1) * group_size]
                s_j = scale_ref[j, :].astype(jnp.float32)  # (TN,)
                partial = jax.lax.dot_general(
                    x_j, u_j,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # (TB, TN) exact
                term = partial.astype(jnp.float32) * s_j[None, :]
                acc = term if acc is None else acc + term

            sum_x = jnp.sum(
                x.astype(jnp.int32).reshape(x.shape[0], PLANES, group_size),
                axis=2,
            ).astype(jnp.float32)  # (TB, PLANES)
            s_all = scale_ref[:].astype(jnp.float32)  # (PLANES, TN)
            if has_zp:
                off = (zp_ref[:].astype(jnp.float32) + 8.0) * s_all
            else:
                off = 8.0 * s_all
            corr = jax.lax.dot_general(
                sum_x, off,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            flush(acc - corr)
            return

        if mode == "fp4":
            # decode every plane, stack to the full (TK, TN) weight tile,
            # scale rows per group, then ONE full-depth MXU dot. (The int4
            # plane-per-group trick would shrink the dots to depth
            # group_size — 16 for nvfp4 — starving the MXU.)
            rows = []
            for j in range(PLANES):
                code = ((uw >> jnp.uint32(4 * j)) & jnp.uint32(0xF)).astype(
                    jnp.int32
                )
                e = (code >> 1) & 3
                mm = (code & 1).astype(jnp.float32)
                mag = jnp.where(
                    e == 0, 0.5 * mm,
                    jnp.where(e == 1, 1.0 + 0.5 * mm,
                              jnp.where(e == 2, 2.0 + mm, 4.0 + 2.0 * mm)),
                )
                rows.append(jnp.where(code >= 8, -mag, mag))
            v = jnp.concatenate(rows, axis=0)           # (TK, TN) f32
            s = scale_ref[:].astype(jnp.float32)        # (TK/g, TN)
            gpt, tn_blk = s.shape
            sb = jnp.broadcast_to(
                s[:, None, :], (gpt, group_size, tn_blk)
            ).reshape(tk, tn_blk)
            w = (v * sb).astype(compute)
            flush(jax.lax.dot_general(
                x.astype(compute), w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            return

        if mode == "mat":
            # materialize the *scaled* (TK, TN) weight tile in-register and
            # run ONE full-depth MXU dot; the offset part of the affine
            # dequant is NOT baked into the tile — it is applied afterwards
            # as the same batched rank-8 correction the int4 mode uses.
            # At decode batches (B < 128 rows) the MXU is row-underutilized,
            # so many shallow depth-`group_size` dots are fill/drain-bound;
            # one deep dot amortizes the pipeline ~8x.
            rows = []
            for j in range(PLANES):
                code_j = ((uw >> jnp.uint32(4 * j))
                          & jnp.uint32(0xF)).astype(jnp.int32)
                s_j = scale_ref[j, :].astype(jnp.float32)  # (TN,)
                w_j = code_j.astype(jnp.float32) * s_j[None, :]
                rows.append(w_j.astype(compute))
            w = jnp.concatenate(rows, axis=0)  # (TK, TN)
            acc = jax.lax.dot_general(
                x.astype(compute), w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            xg = x.astype(jnp.float32).reshape(x.shape[0], PLANES,
                                               group_size)
            sum_x = jnp.sum(xg, axis=2)  # (TB, PLANES)
            s_all = scale_ref[:].astype(jnp.float32)  # (PLANES, TN)
            if has_zp:
                off = (zp_ref[:].astype(jnp.float32) + 8.0) * s_all
            else:
                off = 8.0 * s_all
            corr = jax.lax.dot_general(
                sum_x, off,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            flush(acc - corr)
            return

        # int4 mode. Per plane the VPU only extracts+converts the nibbles
        # and scales the partial dot; the affine offset of all 8 planes is
        # applied at the end as ONE rank-8 MXU dot
        #   corr = [sum(x_0) .. sum(x_7)] @ [(8+zp_j) * s_j]_j
        # ((TB, 8) @ (8, TN)) instead of 8 per-plane (TB,1)x(1,TN) outer
        # products + subtracts — ~2 fewer VPU ops per (TB, TN) tile per
        # plane, which is what was starving the MXU at full batches.
        acc = None
        for j in range(PLANES):
            code_j = ((uw >> jnp.uint32(4 * j)) & jnp.uint32(0xF)).astype(
                jnp.int32
            )
            x_j = x[:, j * group_size : (j + 1) * group_size]  # (TB, g)
            s_j = scale_ref[j, :].astype(jnp.float32)  # (TN,)

            u_j = code_j.astype(compute)
            partial = jax.lax.dot_general(
                x_j.astype(compute), u_j,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TB, TN)
            term = partial * s_j[None, :]
            acc = term if acc is None else acc + term

        xg = x.astype(jnp.float32).reshape(x.shape[0], PLANES, group_size)
        sum_x = jnp.sum(xg, axis=2)  # (TB, PLANES)
        s_all = scale_ref[:].astype(jnp.float32)  # (PLANES, TN)
        if has_zp:
            off = (zp_ref[:].astype(jnp.float32) + 8.0) * s_all
        else:
            off = 8.0 * s_all
        corr = jax.lax.dot_general(
            sum_x, off,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        flush(acc - corr)

    return kernel


def _make_e8_kernel(tk: int, group_size: int, num_k: int = 1):
    """int8-expanded W4A16: weights stored signed int8 (u-8 pre-applied) in
    k-major (K, N); per group one depth-`group_size` MXU dot, scale applied
    to the (TB, TN) output tile. Decode is a single int8->bf16 convert per
    element — ~3x less VPU work than in-kernel nibble extraction, for 2x
    the HBM bytes (still 2x under bf16). The right trade when decode is
    VPU-bound and HBM has headroom (v5e decode batches)."""
    gpt = tk // group_size

    def kernel(x_ref, w_ref, scale_ref, out_ref, acc_ref):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        x = x_ref[:]
        compute = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
        w = w_ref[:]  # (TK, TN) int8
        acc = None
        for j in range(gpt):
            sl = slice(j * group_size, (j + 1) * group_size)
            partial = jax.lax.dot_general(
                x[:, sl].astype(compute), w[sl, :].astype(compute),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s_j = scale_ref[j, :].astype(jnp.float32)
            term = partial * s_j[None, :]
            acc = term if acc is None else acc + term
        acc_ref[:] += acc

        @pl.when(ki == num_k - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n", "k", "group_size", "tk", "tn", "out_dtype"),
)
def w4_e8_matmul(
    x: jnp.ndarray,            # (B, K_orig)
    w8_t: jnp.ndarray,         # (K_pad, N) int8, signed q values
    scales_t: jnp.ndarray,     # (K_pad/g, N) f32, k-order
    n: int,
    k: int,                    # K_pad
    group_size: int,
    tk: int,
    tn: int = 512,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """y = x @ (s * q)^T with q int8-expanded 4-bit values."""
    b, k_orig = x.shape
    tm = max(8, min(512, int(np.ceil(b / 8) * 8)))
    b_pad = int(np.ceil(b / tm) * tm)
    if b_pad != b or k_orig != k:
        x = jnp.pad(x, ((0, b_pad - b), (0, k - k_orig)))

    tn = min(tn, int(np.ceil(n / 128) * 128))
    n_pad = int(np.ceil(n / tn) * tn)
    if n_pad != n:
        w8_t = jnp.pad(w8_t, ((0, 0), (0, n_pad - n)))
        scales_t = jnp.pad(scales_t, ((0, 0), (0, n_pad - n)))

    grid = (b_pad // tm, n_pad // tn, k // tk)
    gpt = tk // group_size
    out = pl.pallas_call(
        _make_e8_kernel(tk, group_size, num_k=k // tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda mi, ni, ki: (mi, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda mi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, tn), lambda mi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda mi, ni, ki: (mi, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * k,
            bytes_accessed=n_pad * k + b_pad * k * 2 + b_pad * n_pad * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x, w8_t, scales_t)
    return out[:b, :n]


@functools.partial(
    jax.jit,
    static_argnames=("n", "k", "group_size", "tk", "tn", "out_dtype",
                     "mode"),
)
def w4a16_matmul(
    x: jnp.ndarray,            # (B, K_orig) activations
    wp_t: jnp.ndarray,         # (K_pad/8, N) kernel-layout packed weights
    scales_t: jnp.ndarray,     # (K_tiles * 8, N)
    zp_t: jnp.ndarray | None,  # (K_tiles * 8, N) int8 or None
    n: int,
    k: int,                    # K_pad
    group_size: int,
    tk: int,
    tn: int | None = None,
    out_dtype=jnp.bfloat16,
    mode: str = "int4",
) -> jnp.ndarray:
    """y = x @ W^T with W packed int4. Returns (B, N) in out_dtype.

    Tiles all three dims: M (tokens — decode batches are one tile, prefill
    token counts loop), N (output features), K innermost for accumulation.

    mode "a8" quantizes the activations per token to int8 on the way in
    (scale = absmax/127, folded back into the output inside the kernel) and
    runs the plane dots on the int8 MXU at 2x the bf16 rate. Execution-
    precision choice, not a checkpoint semantic: W4A16 checkpoints load
    unchanged; opt in via flags when the measured NLL delta qualifies.
    """
    b, k_orig = x.shape
    tm = max(8, min(512, int(np.ceil(b / 8) * 8)))
    if wp_t.ndim == 3:
        # pre-tiled layout: tn is fixed by the layout, so the VMEM budget
        # adjusts through the M tile instead (prefill row counts)
        # budget conservatively: Mosaic's measured stack allocation runs
        # ~2x this estimate (decode temporaries, per-plane partials)
        _tn_fixed = int(wp_t.shape[2])
        while tm > 64 and (tm * tk * 2 + tm * _tn_fixed * 6
                           + tk * _tn_fixed) > 5 * 1024 * 1024:
            tm //= 2
    b_pad = int(np.ceil(b / tm) * tm)

    x_scale = None
    if mode in ("a8", "a8b"):
        absmax = jnp.maximum(
            jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True),
            1e-8,
        )
        x_scale = absmax / 127.0  # (B, 1) f32
        x = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                     -127, 127).astype(jnp.int8)
        if b_pad != b:
            x_scale = jnp.pad(x_scale, ((0, b_pad - b), (0, 0)))
    if b_pad != b or k_orig != k:
        x = jnp.pad(x, ((0, b_pad - b), (0, k - k_orig)))

    tiled = wp_t.ndim == 3  # pre-tiled b8 (nt, K/2, tn): contiguous DMAs
    if tiled:
        assert mode in ("int4b", "a8b"), (
            f"pre-tiled weight layout requires a b8 mode, got {mode!r}")
        tn = int(wp_t.shape[2])
    elif tn is None:
        # the widest N tile VMEM affords: bigger tiles amortize the k-tile
        # grid (measured 9.9 -> 6.9 ms on the bs64 8B chain going
        # 512 -> 4096; 4096 also measured best for the b8 layout — wider
        # tiles past that lose more to pipeline granularity than they
        # gain); clamp by the M tile so double-buffered x/weights/out stay
        # inside scoped VMEM, then shrink to the least-padding divisor of n
        tn_max = 4096 if tm <= 128 else (2048 if tm <= 256 else 1024)
        nt = max(1, -(-n // tn_max))
        tn = int(np.ceil(n / nt / 128) * 128)
    if not tiled:
        tn = min(tn, int(np.ceil(n / 128) * 128))

    # hard VMEM guard (double-buffered x + packed weights + scales, plus
    # out block, f32 accumulator scratch, and in-kernel decode temporaries
    # must fit the 16MB scoped limit regardless of the caller's tn)
    def _vmem(tn_):
        if mode == "fp4":
            srows = tk // group_size
            wb = (tk // 8) * tn_ * 4
            temp = tk * tn_ * 4          # materialized f32 weight tile
        elif mode in ("int4b", "a8b"):
            srows = PLANES
            wb = (tk // 2) * tn_
            temp = 4 * group_size * tn_  # sliced decode tiles in flight
        else:
            srows = PLANES
            wb = (tk // 8) * tn_ * 4
            temp = 2 * (tk // 8) * tn_ * 4
        return (2 * (tm * tk * 2 + wb
                     + srows * tn_ * 4 * (2 if zp_t is not None else 1))
                + tm * tn_ * 6 + temp)
    while not tiled and tn > 128 and _vmem(tn) > 12 * 1024 * 1024:
        tn = (tn // 2 + 127) // 128 * 128
    n_pad = (int(wp_t.shape[0]) * tn if tiled
             else int(np.ceil(n / tn) * tn))
    if n_pad != n:
        if not tiled:
            wp_t = jnp.pad(wp_t, ((0, 0), (0, n_pad - n)))
        scales_t = jnp.pad(scales_t, ((0, 0), (0, n_pad - n)))
        if zp_t is not None:
            zp_t = jnp.pad(zp_t, ((0, 0), (0, n_pad - n)))

    grid = (b_pad // tm, n_pad // tn, k // tk)
    wpt = tk // 2 if mode in ("int4b", "a8b") else tk // PLANES

    # int4/mat retiled scales have 8 rows (one group per plane) per k-tile;
    # fp4 and b8 scales carry tk/group_size rows per k-tile (b8 supports
    # deepened TK beyond 8*group_size)
    scale_rows = (tk // group_size if mode in ("fp4", "int4b", "a8b")
                  else PLANES)
    in_specs = [
        pl.BlockSpec((tm, tk), lambda mi, ni, ki: (mi, ki),
                     memory_space=pltpu.VMEM),
        (pl.BlockSpec((1, wpt, tn), lambda mi, ni, ki: (ni, ki, 0),
                      memory_space=pltpu.VMEM) if tiled else
         pl.BlockSpec((wpt, tn), lambda mi, ni, ki: (ki, ni),
                      memory_space=pltpu.VMEM)),
        pl.BlockSpec((scale_rows, tn), lambda mi, ni, ki: (ki, ni),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, wp_t, scales_t]
    if x_scale is not None:
        in_specs.append(
            pl.BlockSpec((tm, 1), lambda mi, ni, ki: (mi, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(x_scale)
    if zp_t is not None:
        in_specs.append(
            pl.BlockSpec((scale_rows, tn), lambda mi, ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM)
        )
        args.append(zp_t)

    kernel = _make_kernel(tk, group_size, zp_t is not None, mode,
                          num_k=k // tk)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda mi, ni, ki: (mi, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * k,
            bytes_accessed=n_pad * k // 2 + b_pad * k * 2
            + b_pad * n_pad * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*args)

    return out[:b, :n]
