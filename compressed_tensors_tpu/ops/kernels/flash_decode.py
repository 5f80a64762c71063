"""Length-aware flash decode-attention Pallas kernel (quantized KV).

Improves on `decode_attention` (which auto-DMAs each row's full *allocated*
cache block every step): the KV cache stays in HBM and each grid program
(one batch row) manually DMAs only the chunks covering its row's current
length, folding them into an online-softmax accumulator. A row at length L
costs ceil((L+1)/C) chunk fetches + dots regardless of the allocation size
S_pad — for serving engines with max_len-sized caches this is the
difference between O(max_len) and O(current_len) HBM traffic + MXU fills
per decode step.

Latency hiding (the failure mode of a naive in-kernel chunk loop is DMA
stalls that the auto-pipelined block kernel doesn't have):
- chunk 0 of row b+1 is prefetched BY row b into a row-parity buffer pair,
  so no program starts with a cold DMA wait
- chunks 1..nc-1 stream through a 3-deep buffer ring with 2 DMAs in flight
- the new token enters the softmax in-register (quantize->dequantize first,
  so this step's attention sees exactly what later steps read back — ref
  modeling/kvcache.py:65-66); its cache write-back is staged from the
  already-fetched chunk holding the write position and DMA'd out with
  deferred waits (decode_attention's parity-slot pattern), so no
  read-modify-write round trip

Cache layout: stacked (L, B, KVH, S_pad, Dp); caches alias in/out in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_decode_attention"]

NLB = 3  # loop-chunk buffer ring depth (2 DMAs in flight + 1 in use)


def _interpret() -> bool:
    # load-time-resolved flag (never an env read at trace time)
    from compressed_tensors_tpu.flags import FLAGS

    if FLAGS.pallas_interpret:
        return True
    return jax.default_backend() not in ("tpu",)


def _make_kernel(kvh: int, rep: int, dp: int, s_max: int, chunk: int,
                 cache_dtype, compute_dtype, has_scales: bool,
                 inv_sqrt_d: float, nb: int):
    h = kvh * rep
    kc = kvh * chunk
    byte1 = jnp.dtype(cache_dtype).itemsize == 1
    walign = 32 if byte1 else 8
    span = min(walign, chunk)

    def kernel(lens_ref, lyr_ref, *refs):
        layer = lyr_ref[0]
        if has_scales:
            (q_ref, newk_ref, newv_ref, kscale_ref, vscale_ref,
             _ck_in, _cv_in, out_ref, ck_hbm, cv_hbm,
             c0k, c0v, lk, lv, stage_k, stage_v,
             c0sem, lsem, wsem, flags) = refs
            k_scale = kscale_ref[0]
            v_scale = vscale_ref[0]
        else:
            (q_ref, newk_ref, newv_ref, _ck_in, _cv_in,
             out_ref, ck_hbm, cv_hbm,
             c0k, c0v, lk, lv, stage_k, stage_v,
             c0sem, lsem, wsem, flags) = refs
            k_scale = v_scale = None
        b = pl.program_id(0)
        nprog = pl.num_programs(0)
        length = lens_ref[b]
        active = length >= 0
        wpos = jnp.maximum(length, 0)
        # chunks covering [0, wpos]: always includes the write position
        nc = (wpos + chunk) // chunk
        par = jax.lax.rem(b, 2)

        def dequant(v, scale):
            if scale is not None and v.dtype != compute_dtype:
                return (v.astype(jnp.float32)
                        * scale.astype(jnp.float32)).astype(compute_dtype)
            return v.astype(compute_dtype)

        def quantize_new(new, scale):
            if scale is not None and cache_dtype != new.dtype:
                sc = scale.astype(jnp.float32)
                scaled = new.astype(jnp.float32) / sc
                if str(cache_dtype).startswith("float8"):
                    return scaled.astype(cache_dtype)
                return jnp.clip(jnp.round(scaled), -128, 127).astype(
                    cache_dtype
                )
            return new.astype(cache_dtype)

        def c0_dma(row, slot):
            return (
                pltpu.make_async_copy(
                    ck_hbm.at[layer, row, :, pl.ds(0, chunk), :],
                    c0k.at[slot], c0sem.at[slot, 0]),
                pltpu.make_async_copy(
                    cv_hbm.at[layer, row, :, pl.ds(0, chunk), :],
                    c0v.at[slot], c0sem.at[slot, 1]),
            )

        def loop_dma(ci, slot):
            return (
                pltpu.make_async_copy(
                    ck_hbm.at[layer, b, :, pl.ds(ci * chunk, chunk), :],
                    lk.at[slot], lsem.at[slot, 0]),
                pltpu.make_async_copy(
                    cv_hbm.at[layer, b, :, pl.ds(ci * chunk, chunk), :],
                    lv.at[slot], lsem.at[slot, 1]),
            )

        # prologue: the first program fetches its own chunk 0
        @pl.when(b == 0)
        def _():
            dk, dv = c0_dma(0, 0)
            dk.start()
            dv.start()

        # prefetch the next row's chunk 0 (lands while this row computes)
        @pl.when(b + 1 < nprog)
        def _():
            dk, dv = c0_dma(b + 1, 1 - par)
            dk.start()
            dv.start()

        # kick off loop chunks 1, 2 immediately (before any compute or the
        # chunk-0 wait) so their latency hides behind the new-token math
        # and the chunk-0 fold. Static guard: the chunk must exist in the
        # allocation at all.
        for j in (1, 2):
            if j * chunk < s_max:
                @pl.when(j < nc)
                def _(j=j):
                    dk, dv = loop_dma(j, j - 1)
                    dk.start()
                    dv.start()

        # scalar cache scales fold into q (scores are linear in k_scale)
        # and onto the final output (linear in v_scale): the quantized
        # cache chunks then need only a raw dtype convert, never a
        # per-element scale multiply (~5x on the fp8-cache path)
        folded = k_scale is not None and cache_dtype != compute_dtype
        if folded:
            qh = (q_ref[0].astype(jnp.float32)
                  * k_scale.astype(jnp.float32)).astype(compute_dtype)

            def dequant(v, scale):  # noqa: F811 — raw convert only
                return v.astype(compute_dtype)
        else:
            qh = q_ref[0].astype(compute_dtype)       # (h, Dp)
        new_k_c = quantize_new(newk_ref[0], k_scale)  # cache repr (kvh, Dp)
        new_v_c = quantize_new(newv_ref[0], v_scale)
        new_k = dequant(new_k_c, k_scale)
        new_v = dequant(new_v_c, v_scale)

        # ---- new-token contribution (overlaps the chunk-0 DMA) ----------- #
        s_new = jax.lax.dot_general(
            qh, new_k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_sqrt_d  # (h, kvh)
        qrow = jax.lax.broadcasted_iota(jnp.int32, (h, kvh), 0)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (h, kvh), 1)
        own = (qrow // rep) == gcol
        s_new = jnp.where(own, s_new, -jnp.inf)
        m0 = jnp.max(s_new, axis=-1, keepdims=True)   # (h, 1)
        p_new = jnp.where(own, jnp.exp(s_new - m0), 0.0)
        l0 = jnp.sum(p_new, axis=-1, keepdims=True)
        acc0 = jax.lax.dot_general(
            p_new.astype(compute_dtype), new_v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (h, Dp)

        # wait for my chunk 0 (issued by the previous program / prologue)
        dk, dv = c0_dma(b, par)
        dk.wait()
        dv.wait()

        col = jax.lax.broadcasted_iota(jnp.int32, (h, kc), 1)
        qrow_c = jax.lax.broadcasted_iota(jnp.int32, (h, kc), 0) // rep
        grp = col // chunk
        cpos = jax.lax.rem(col, chunk)

        def fold(ci, kbuf, vbuf, m, l, acc):
            keys = dequant(kbuf.reshape(kc, dp), k_scale)
            vals = dequant(vbuf.reshape(kc, dp), v_scale)
            s = jax.lax.dot_general(
                qh, keys,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * inv_sqrt_d  # (h, kvh*chunk)
            valid = (qrow_c == grp) & (ci * chunk + cpos < wpos)
            s = jnp.where(valid, s, -jnp.inf)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            corr = jnp.exp(m - m_new)
            p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jax.lax.dot_general(
                p.astype(compute_dtype), vals,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l, acc

        # chunk 0 (always fetched; inactive rows skip via the where below)
        mc, lc, accc = fold(0, c0k[par], c0v[par], m0, l0, acc0)
        use0 = active
        m = jnp.where(use0, mc, m0)
        l = jnp.where(use0, lc, l0)
        acc = jnp.where(use0, accc, acc0)

        def body(j, carry):
            m, l, acc = carry
            slot = jax.lax.rem(j - 1, nb)
            dk, dv = loop_dma(j, slot)
            dk.wait()
            dv.wait()
            m, l, acc = fold(j, lk[slot], lv[slot], m, l, acc)

            nxt = j + 2
            @pl.when(nxt < nc)
            def _():
                dk, dv = loop_dma(nxt, jax.lax.rem(nxt - 1, nb))
                dk.start()
                dv.start()
            return m, l, acc

        m, l, acc = jax.lax.fori_loop(1, jnp.where(active, nc, 0), body,
                                      (m, l, acc))
        out = acc / jnp.maximum(l, 1e-30)
        if folded:
            out = out * v_scale.astype(jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)

        # ---- write-back: stage the dirty aligned span from the fetched --- #
        # chunk holding wpos, DMA it out, defer the wait two programs
        # (identical transfer sizes let a fresh descriptor decrement the
        # right semaphore)
        wchunk = nc - 1
        woff = wpos - wchunk * chunk
        wstart = jnp.minimum((woff // walign) * walign,
                             jnp.int32(max(chunk - span, 0)))
        wstart = pl.multiple_of(wstart, walign)
        gstart = wchunk * chunk + wstart
        dst_k = ck_hbm.at[layer, b, :, pl.ds(gstart, span), :]
        dst_v = cv_hbm.at[layer, b, :, pl.ds(gstart, span), :]

        def _wait(slot_idx):
            pltpu.make_async_copy(
                stage_k.at[0], dst_k, wsem.at[slot_idx, 0]).wait()
            pltpu.make_async_copy(
                stage_v.at[0], dst_v, wsem.at[slot_idx, 1]).wait()

        @pl.when((b >= 2) & (flags[par] == 1))
        def _():
            _wait(par)

        @pl.when(active)
        def _():
            row = jax.lax.broadcasted_iota(jnp.int32, (kvh, span, dp), 1)
            sel = row == (woff - wstart)
            nk_b = jnp.broadcast_to(new_k_c[:, None, :], (kvh, span, dp))
            nv_b = jnp.broadcast_to(new_v_c[:, None, :], (kvh, span, dp))
            # source: chunk 0 buffer if the write chunk is 0, else the
            # loop buffer that holds chunk nc-1
            lslot = jax.lax.rem(jnp.maximum(wchunk - 1, 0), nb)

            @pl.when(wchunk == 0)
            def _():
                stage_k[par] = jnp.where(
                    sel, nk_b, c0k[par, :, pl.ds(wstart, span), :])
                stage_v[par] = jnp.where(
                    sel, nv_b, c0v[par, :, pl.ds(wstart, span), :])

            @pl.when(wchunk > 0)
            def _():
                stage_k[par] = jnp.where(
                    sel, nk_b, lk[lslot, :, pl.ds(wstart, span), :])
                stage_v[par] = jnp.where(
                    sel, nv_b, lv[lslot, :, pl.ds(wstart, span), :])

            pltpu.make_async_copy(stage_k.at[par], dst_k,
                                  wsem.at[par, 0]).start()
            pltpu.make_async_copy(stage_v.at[par], dst_v,
                                  wsem.at[par, 1]).start()

        flags[par] = jnp.where(active, 1, 0)

        # last program drains everything still in flight
        @pl.when(b == nprog - 1)
        def _():
            @pl.when((nprog >= 2) & (flags[1 - par] == 1))
            def _():
                _wait(1 - par)

            @pl.when(flags[par] == 1)
            def _():
                _wait(par)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kvh", "rep", "d", "true_d", "chunk"),
)
def flash_decode_attention(
    q: jnp.ndarray,        # (B, H, Dp) post-RoPE queries
    new_k: jnp.ndarray,    # (B, KVH, Dp) post-RoPE keys for this step
    new_v: jnp.ndarray,    # (B, KVH, Dp)
    cache_k: jnp.ndarray,  # (L, B, KVH, S_pad, Dp) stacked cache
    cache_v: jnp.ndarray,
    lengths: jnp.ndarray,  # (B,) int32; negative = inactive slot
    kvh: int,
    rep: int,
    d: int,                # padded head dim (Dp)
    k_scale: jnp.ndarray | None = None,
    v_scale: jnp.ndarray | None = None,
    true_d: int | None = None,
    layer: int | jnp.ndarray = 0,
    chunk: int = 64,
):
    """Returns (out (B, H, Dp), cache_k, cache_v); caches update in place.

    S_pad must be a multiple of ``chunk``. Per-row traffic + compute is
    O(ceil(length / chunk)), independent of S_pad.
    """
    lN, b, _, s_max, dp = cache_k.shape
    assert s_max % chunk == 0, (s_max, chunk)
    h = kvh * rep
    compute_dtype = q.dtype
    has_scales = k_scale is not None

    in_specs = [
        pl.BlockSpec((1, h, dp), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kvh, dp), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kvh, dp), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),   # cache_k (HBM)
        pl.BlockSpec(memory_space=pl.ANY),   # cache_v (HBM)
    ]
    args = [q, new_k, new_v, cache_k, cache_v]
    if has_scales:
        in_specs = in_specs[:3] + [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + in_specs[3:]
        args = args[:3] + [
            k_scale.reshape(1).astype(jnp.float32),
            v_scale.reshape(1).astype(jnp.float32),
        ] + args[3:]

    byte1 = jnp.dtype(cache_k.dtype).itemsize == 1
    walign = 32 if byte1 else 8
    span = min(walign, chunk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, h, dp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, kvh, chunk, dp), cache_k.dtype),    # c0k (parity)
            pltpu.VMEM((2, kvh, chunk, dp), cache_k.dtype),    # c0v
            pltpu.VMEM((NLB, kvh, chunk, dp), cache_k.dtype),  # lk ring
            pltpu.VMEM((NLB, kvh, chunk, dp), cache_k.dtype),  # lv ring
            pltpu.VMEM((2, kvh, span, dp), cache_k.dtype),     # stage_k
            pltpu.VMEM((2, kvh, span, dp), cache_k.dtype),     # stage_v
            pltpu.SemaphoreType.DMA((2, 2)),                   # c0sem
            pltpu.SemaphoreType.DMA((NLB, 2)),                 # lsem
            pltpu.SemaphoreType.DMA((2, 2)),                   # wsem
            pltpu.SMEM((2,), jnp.int32),                       # issued flags
        ],
    )

    inv_sqrt_d = 1.0 / float(np.sqrt(true_d if true_d is not None else dp))
    # operand indices count the scalar-prefetch args first
    if has_scales:
        arg_index = {7: 1, 8: 2}
    else:
        arg_index = {5: 1, 6: 2}

    # traced layer index (scalar prefetch): one compiled kernel serves every
    # layer of the stacked cache instead of L static specializations
    lyr_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    kernel = _make_kernel(kvh, rep, dp, s_max, chunk, cache_k.dtype,
                          compute_dtype, has_scales, inv_sqrt_d, NLB)

    out, ck, cv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, dp), compute_dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ),
        input_output_aliases=arg_index,
        interpret=_interpret(),
    )(lengths, lyr_arr, *args)
    return out, ck, cv
