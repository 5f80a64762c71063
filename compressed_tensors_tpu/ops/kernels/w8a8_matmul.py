"""Fused W8A8 dynamic-quant matmul Pallas kernel (int8 and fp8).

One kernel per matmul: per-token activation quantization (the reference's
dynamic TOKEN strategy, ref quant_scheme.py INT8_W8A8/FP8_DYNAMIC presets)
happens in VMEM, the dot runs on the MXU in int8/fp8 with fp32/int32
accumulation, and the per-token x per-channel rescale applies to the output
tile. Activations never materialize quantized in HBM and the weight is read
once in its 1-byte storage dtype.

Weight layout: stored transposed (K, N) so the contraction is over sublanes
(same reasoning as the W4A16 kernel); per-channel weight scales are a
(1, N) row broadcast over the output tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["w8a8_matmul", "prepare_w8_weight"]


def _interpret() -> bool:
    # load-time-resolved flag (never an env read at trace time)
    from compressed_tensors_tpu.flags import FLAGS

    if FLAGS.pallas_interpret:
        return True
    return jax.default_backend() not in ("tpu",)


def prepare_w8_weight(weight: jnp.ndarray) -> jnp.ndarray:
    """Checkpoint layout (N, K) int8/fp8 -> kernel layout (K, N)."""
    return weight.T


def default_w8_tn(n: int, k: int) -> int:
    """N-tile width for the pre-tiled layout: as wide as a ~3MB VMEM weight
    block affords (K stays whole per tile for the in-kernel dynamic
    per-token act quant), shrunk to the least-padding divisor of n."""
    tn_max = min(2048, max(256, ((3 << 20) // max(k, 1)) // 128 * 128))
    nt = max(1, -(-n // tn_max))
    return min(tn_max, int(np.ceil(n / nt / 128) * 128))


def prepare_w8_weight_tiled(weight: jnp.ndarray,
                            tn: int | None = None) -> jnp.ndarray:
    """Checkpoint layout (N, K) -> pre-tiled kernel layout (N/tn, K, tn).

    A (K, TN) block of the flat (K, N) layout is a strided column slice —
    K separate TN-byte bursts, far below HBM DMA granularity (the 128k-
    vocab lm_head pays K=4096 256-byte bursts per tile). Pre-tiling makes
    every program's weight block one contiguous K*tn-byte stream."""
    n, k = weight.shape
    if tn is None:
        tn = default_w8_tn(n, k)
    n_pad = int(np.ceil(n / tn) * tn)
    w_t = weight.T  # (K, N)
    if n_pad != n:
        w_t = jnp.pad(w_t, ((0, 0), (0, n_pad - n)))
    return (w_t.reshape(k, n_pad // tn, tn)
            .transpose(1, 0, 2))  # (nt, K, tn)


def _make_kernel(is_int8: bool, q_max: float):
    # symmetric dynamic scale = maxabs / (bit_range / 2):
    # int8 range [-128, 127] -> /127.5; fp8 [-448, 448] -> /448
    # (ref quantization/utils/helpers.py:79-87)
    half_range = (2 * q_max + 1) / 2 if is_int8 else q_max

    def kernel(x_ref, w_ref, wscale_ref, out_ref, xq_ref, xs_ref):
        ni = pl.program_id(1)

        # quantize the x tile once per M tile (ni == 0) and reuse the
        # VMEM-scratch copy across all N tiles — re-quantizing per N tile
        # is pure redundant VPU work (grid iterates ni fastest)
        @pl.when(ni == 0)
        def _():
            x = x_ref[:].astype(jnp.float32)  # (TB, K)
            absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)  # (TB, 1)
            x_scale = jnp.maximum(absmax / half_range, 1e-10)
            scaled = x / x_scale
            if is_int8:
                xq_ref[:] = jnp.round(
                    jnp.clip(scaled, -q_max - 1, q_max)
                ).astype(jnp.int8)
            else:
                xq_ref[:] = jnp.clip(scaled, -q_max, q_max).astype(
                    xq_ref.dtype
                )
            xs_ref[:] = jnp.broadcast_to(x_scale, xs_ref.shape)

        w = w_ref[0] if w_ref.shape[0] == 1 and len(w_ref.shape) == 3 \
            else w_ref[:]
        acc = jax.lax.dot_general(
            xq_ref[:], w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if is_int8 else jnp.float32,
        ).astype(jnp.float32)
        w_scale = wscale_ref[0, :].astype(jnp.float32)  # (TN,)
        # write the out block once in its final dtype — an f32 out pays a
        # write + convert-read HBM round trip per matmul (r5, same fix as
        # the W4 kernels)
        out_ref[:] = (acc * xs_ref[:, :1] * w_scale[None, :]).astype(
            out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n", "k", "tn", "out_dtype")
)
def w8a8_matmul(
    x: jnp.ndarray,        # (B, K) activations (bf16/f32)
    w_t: jnp.ndarray,      # (K, N) int8 or fp8_e4m3
    w_scale: jnp.ndarray,  # (1, N) per-channel (or broadcast per-tensor)
    n: int,
    k: int,
    tn: int = 512,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """y = dynamic_quant(x) @ W^T rescaled; returns (B, N).

    M (tokens) is tiled; K stays whole per tile because the dynamic
    per-token scale needs the full-row absmax. The M tile adapts to K so
    the in-kernel f32 staging copy of the x tile fits VMEM.
    """
    b = x.shape[0]
    # ~6 bytes/elem live per x element (bf16 in + f32 staged); budget ~6MB
    tm = int(6e6 // (6 * k)) // 8 * 8
    tm = max(8, min(512, tm))
    tm = min(tm, max(8, int(np.ceil(b / 8) * 8)))
    b_pad = int(np.ceil(b / tm) * tm)
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))

    tiled = w_t.ndim == 3  # pre-tiled (nt, K, tn): contiguous tile DMAs
    if tiled:
        tn = w_t.shape[2]
        n_pad = w_t.shape[0] * tn
        if w_scale.shape[-1] != n_pad:
            w_scale = jnp.pad(w_scale, ((0, 0), (0, n_pad - n)))
    else:
        if k > 8192:
            # large-K models (8B down_proj: K=14336): a (K, TN) weight tile
            # at TN=512 is ~7MB fp8 and double-buffers past the default
            # 16MB scoped-vmem limit
            tn = min(tn, 256)
        if n > 8192:
            # huge-N matmuls in the flat layout: smaller N tiles pipeline
            # the strided column-slice DMAs better (measured 2.7x at
            # N=32000, B=64); the pre-tiled layout above is the real fix
            tn = min(tn, 256)
        tn = min(tn, int(np.ceil(n / 128) * 128))
        n_pad = int(np.ceil(n / tn) * tn)
        if n_pad != n:
            w_t = jnp.pad(w_t, ((0, 0), (0, n_pad - n)))
            w_scale = jnp.pad(w_scale, ((0, 0), (0, n_pad - n)))

    is_int8 = w_t.dtype == jnp.int8
    q_max = 127.0 if is_int8 else 448.0

    w_spec = (
        pl.BlockSpec((1, k, tn), lambda mi, ni: (ni, 0, 0),
                     memory_space=pltpu.VMEM)
        if tiled else
        pl.BlockSpec((k, tn), lambda mi, ni: (0, ni),
                     memory_space=pltpu.VMEM)
    )
    out = pl.pallas_call(
        _make_kernel(is_int8, q_max),
        grid=(b_pad // tm, n_pad // tn),
        in_specs=[
            pl.BlockSpec((tm, k), lambda mi, ni: (mi, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, tn), lambda mi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda mi, ni: (mi, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_pad), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, k), jnp.int8 if is_int8 else w_t.dtype),
            pltpu.VMEM((tm, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * k,
            bytes_accessed=n_pad * k + b_pad * k * 2 + b_pad * n_pad * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # whole-K tiles (the dynamic per-token scale needs the full-row
            # absmax) need headroom past the 16MB default scoped limit
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, w_t, w_scale)

    return out[:b, :n]
