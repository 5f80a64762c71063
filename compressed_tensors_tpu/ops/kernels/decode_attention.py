"""Fused decode attention Pallas kernel (single query step, quantized KV).

One kernel per layer per decode step replaces the whole attention tail
(cache scatter, GQA einsums, masking, softmax, weighted sum): per batch row
it appends the new post-RoPE K/V into the cache *in place* and computes
grouped-query attention over the valid prefix.

Write path: the cache outputs live in ANY/HBM memory space aliased onto the
inputs, and only the single new-token row is DMA'd back from the VMEM input
block — the cache streams HBM→VMEM once per step (read) and writes back one
row per head instead of the whole cache, so steady-state decode cache
traffic is ~1x read + epsilon instead of read+write.

Cache layout is head-major (B, KVH, S_pad, Dp) — optionally stacked over
layers as (L, B, KVH, S_pad, Dp) with a static layer index — with head_dim
padded to the 128-lane width and the sequence on sublanes: every per-head
access is a static leading index, so the kernel contains no lane-splitting
reshapes, slices, or concats (none of which Mosaic can lower). Padding
lanes are zero, contribute nothing to the dots, and are free on fp8 caches
(same bytes as an unpadded bf16 cache).

Rows with a negative length are inactive (serving-engine sentinel): their
cache rows are untouched and their outputs are garbage the caller discards.

Optional k_scale/v_scale per-tensor scales store the cache in fp8/int8
(ref modeling/kvcache.py semantics — quantize on update, dequantize on
read) at half/quarter the bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_attention"]


def _interpret() -> bool:
    # load-time-resolved flag (never an env read at trace time)
    from compressed_tensors_tpu.flags import FLAGS

    if FLAGS.pallas_interpret:
        return True
    return jax.default_backend() not in ("tpu",)


def _make_kernel(kvh: int, rep: int, d: int, s_max: int, cache_dtype,
                 compute_dtype, has_scales: bool, inv_sqrt_d: float,
                 stacked: bool, g_rows: int):
    def kernel(lens_ref, lyr_ref, *refs):
        layer = lyr_ref[0]
        if has_scales:
            (q_ref, newk_ref, newv_ref, ck_ref, cv_ref, kscale_ref,
             vscale_ref, out_ref, ck_hbm, cv_hbm,
             sem, scores_ref, probs_ref) = refs
            k_scale = kscale_ref
            v_scale = vscale_ref
        else:
            (q_ref, newk_ref, newv_ref, ck_ref, cv_ref,
             out_ref, ck_hbm, cv_hbm,
             sem, scores_ref, probs_ref) = refs
            k_scale = v_scale = None
        gi = pl.program_id(0)
        h = kvh * rep
        ks = kvh * s_max

        def head_scales(scale_ref, shape):
            # per-head (kvh,) SMEM scales broadcast over a block whose
            # leading dim is the kv head: built with iota + scalar selects
            # (a (kvh,) vector reshaped to (kvh, 1, 1) is a shape cast
            # Mosaic cannot lower; kvh scalar-broadcast wheres are cheap)
            rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            sc = jnp.full(shape, scale_ref[0], jnp.float32)
            for i in range(1, kvh):
                sc = jnp.where(rows == i, scale_ref[i], sc)
            return sc

        def quantize_new(new, scale_ref):
            # new: (kvh, d)
            if scale_ref is not None and cache_dtype != new.dtype:
                scaled = new.astype(jnp.float32) / head_scales(
                    scale_ref, new.shape)
                if str(cache_dtype).startswith("float8"):
                    return scaled.astype(cache_dtype)
                return jnp.clip(jnp.round(scaled), -128, 127).astype(
                    cache_dtype
                )
            return new.astype(cache_dtype)

        def dequant(v, scale_ref):
            # v: (kvh, s, d)
            if scale_ref is not None and v.dtype != compute_dtype:
                return (v.astype(jnp.float32)
                        * head_scales(scale_ref, v.shape)).astype(
                    compute_dtype)
            return v.astype(compute_dtype)

        def qrow_scales(scale_ref):
            # cache scales folded onto the (h, 1) query/output rows: row r
            # belongs to kv head r // rep. Attention is linear in both K
            # (scores scale with k_scale -> multiply q) and V (outputs
            # scale with v_scale -> multiply out rows), so scalar/per-head
            # cache dequant needs NO per-element work on the (kvh, s, d)
            # blocks — the dominant cost of the old path (astype-f32 +
            # full-block scale multiply per row per layer).
            rows = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0) // rep
            sc = jnp.full((h, 1), scale_ref[0], jnp.float32)
            for i in range(1, kvh):
                sc = jnp.where(rows == i, scale_ref[i], sc)
            return sc

        align = 32 if jnp.dtype(cache_dtype).itemsize == 1 else 8
        span = min(align, s_max)

        def _dsts(b, wstart):
            if stacked:
                return (ck_hbm.at[layer, b, :, pl.ds(wstart, span), :],
                        cv_hbm.at[layer, b, :, pl.ds(wstart, span), :])
            return (ck_hbm.at[b, :, pl.ds(wstart, span), :],
                    cv_hbm.at[b, :, pl.ds(wstart, span), :])

        # Each program owns g_rows batch rows (static unroll): the per-row
        # attention math is latency-bound small dots (~0.4us fixed cost per
        # grid step at one row/program), so amortizing the grid-step cost
        # over g_rows rows is the difference between overhead-bound and
        # DMA-bound decode attention.
        #
        # The per-row work is split into three phases so the softmax — the
        # dominant per-row serial cost (cross-lane max/sum reductions +
        # exp latency, ~0.3 ms/step at 22 layers x 64 rows when computed
        # row-by-row) — runs ONCE, batched over all g_rows rows in the
        # scores scratch, instead of g_rows serial times:
        #   1. append the new token per row (dynamic tile RMW)
        #   2. per-row score dots + masks -> scores scratch (g, h, kvh*s)
        #   3. one batched softmax over the scratch
        #   4. per-row output dots + dirty-tile write-back
        for g in range(g_rows):
            b = gi * g_rows + g
            length = lens_ref[b]
            active = length >= 0
            wpos = jnp.maximum(length, 0)

            # Append the new token via an aligned read-modify-write of the
            # single (kvh, align, d) sublane tile containing the write
            # position — NOT a full-block masked overlay: iota + compare +
            # 2x where over the whole (kvh*s, d) block costs ~0.5us of VPU
            # per row and was the dominant per-row cost. (Mosaic requires
            # dynamic sublane indices to be tile-aligned, hence RMW of the
            # aligned tile rather than a 1-row store.) Inactive rows skip
            # the store (cache untouched in VMEM too, so the skipped
            # write-back leaves HBM consistent).
            tile0 = jnp.minimum((wpos // align) * align,
                                jnp.int32(max(s_max - align, 0)))
            tile0 = pl.multiple_of(tile0, align)
            tspan = min(align, s_max)

            @pl.when(active)
            def _(g=g, tile0=tile0):
                row_in_tile = jax.lax.broadcasted_iota(
                    jnp.int32, (kvh, tspan, d), 1)
                hit = row_in_tile == (wpos - tile0)
                ck_tile = ck_ref[g, :, pl.ds(tile0, tspan), :]
                cv_tile = cv_ref[g, :, pl.ds(tile0, tspan), :]
                nk_t = jnp.broadcast_to(
                    quantize_new(newk_ref[g], k_scale)[:, None, :],
                    (kvh, tspan, d))
                nv_t = jnp.broadcast_to(
                    quantize_new(newv_ref[g], v_scale)[:, None, :],
                    (kvh, tspan, d))
                ck_ref[g, :, pl.ds(tile0, tspan), :] = jnp.where(
                    hit, nk_t, ck_tile)
                cv_ref[g, :, pl.ds(tile0, tspan), :] = jnp.where(
                    hit, nv_t, cv_tile)
                # write the dirty tile straight back to HBM from the block
                # (tile-aligned; the rest of the tile holds unchanged data
                # so rewriting it is a no-op). Issued here, waited in phase
                # 5: the copy overlaps the score/softmax/output phases.
                dst_k, dst_v = _dsts(b, tile0)
                pltpu.make_async_copy(
                    ck_ref.at[g, :, pl.ds(tile0, span), :], dst_k,
                    sem.at[0, g]).start()
                pltpu.make_async_copy(
                    cv_ref.at[g, :, pl.ds(tile0, span), :], dst_v,
                    sem.at[1, g]).start()

        # phase 2: per-row score dots + masks into the scores scratch.
        # All kv heads fold into a single (h, kvh*s) score matrix: the
        # cache block (kvh, s, d) is viewed as (kvh*s, d) (a free
        # reshape — merged leading dims, s % 8 == 0), one MXU dot
        # computes every (query-head, key) pair, and a block-diagonal
        # mask keeps only same-group pairs. kvh-times redundant MXU
        # work, but it turns 2*kvh tiny latency-bound dots per row
        # into 2 larger ones.
        qrow = jax.lax.broadcasted_iota(jnp.int32, (h, ks), 0)
        kcol = jax.lax.broadcasted_iota(jnp.int32, (h, ks), 1)
        same_group = (qrow // rep) == (kcol // s_max)
        kpos = jax.lax.rem(kcol, s_max)
        k_fold = qrow_scales(k_scale) if (
            k_scale is not None and cache_dtype != compute_dtype) else None
        for g in range(g_rows):
            b = gi * g_rows + g
            length = lens_ref[b]
            if k_fold is not None:
                # fp8/int8 cache: raw convert only; k_scale rides on q
                keys = ck_ref[g].astype(compute_dtype).reshape(ks, d)
                qh = (q_ref[g].astype(jnp.float32) * k_fold).astype(
                    compute_dtype)
            else:
                keys = dequant(ck_ref[g], k_scale).reshape(ks, d)
                qh = q_ref[g].astype(compute_dtype)  # (h, Dp)

            scores = jax.lax.dot_general(
                qh, keys,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * inv_sqrt_d  # (h, kvh*s)
            # mask per row (the row length is a scalar here; a batched
            # (g_rows, 1, 1) length vector is a reshape Mosaic can't lower)
            scores_ref[g] = jnp.where(same_group & (kpos <= length),
                                      scores, -1e30)

        # phase 3: ONE batched softmax over every row's scores — the
        # dominant per-row serial cost (cross-lane max/sum + exp latency)
        # amortizes over all g_rows rows
        sc = scores_ref[:]
        m = jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc - m)
        probs_ref[:] = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
            compute_dtype)

        # phase 4: per-row output dots + dirty-tile write-back
        v_fold = qrow_scales(v_scale) if (
            v_scale is not None and cache_dtype != compute_dtype) else None
        for g in range(g_rows):
            b = gi * g_rows + g
            length = lens_ref[b]
            active = length >= 0
            wpos = jnp.maximum(length, 0)
            if v_fold is not None:
                # fp8/int8 cache: raw convert; v_scale rides on the output
                # rows (every value feeding q-row r comes from kv head
                # r // rep, so the fold is exact)
                values = cv_ref[g].astype(compute_dtype).reshape(ks, d)
            else:
                values = dequant(cv_ref[g], v_scale).reshape(ks, d)
            probs = probs_ref[g]
            # zero outside the block diagonal: the dot re-separates heads
            out_h = jax.lax.dot_general(
                probs, values,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (h, Dp)
            if v_fold is not None:
                out_h = out_h * v_fold
            out_ref[g] = out_h.astype(out_ref.dtype)

        # phase 5: drain the write-back DMAs issued in phase 1 (they
        # overlapped phases 2-4; the input block buffer must not be
        # recycled by the pipeline before the copies out of it complete)
        for g in range(g_rows):
            b = gi * g_rows + g
            length = lens_ref[b]
            wpos = jnp.maximum(length, 0)
            wstart = jnp.minimum((wpos // align) * align,
                                 jnp.int32(max(s_max - align, 0)))
            wstart = pl.multiple_of(wstart, align)
            dst_k, dst_v = _dsts(b, wstart)

            @pl.when(length >= 0)
            def _(g=g, wstart=wstart, dst_k=dst_k, dst_v=dst_v):
                pltpu.make_async_copy(
                    ck_ref.at[g, :, pl.ds(wstart, span), :], dst_k,
                    sem.at[0, g]).wait()
                pltpu.make_async_copy(
                    cv_ref.at[g, :, pl.ds(wstart, span), :], dst_v,
                    sem.at[1, g]).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kvh", "rep", "d", "true_d"),
)
def decode_attention(
    q: jnp.ndarray,        # (B, H, Dp) post-RoPE queries (lane-padded)
    new_k: jnp.ndarray,    # (B, KVH, Dp) post-RoPE keys for this step
    new_v: jnp.ndarray,    # (B, KVH, Dp)
    cache_k: jnp.ndarray,  # (B, KVH, S_pad, Dp) or (L, B, KVH, S_pad, Dp)
    cache_v: jnp.ndarray,
    lengths: jnp.ndarray,  # (B,) int32; negative = inactive slot
    kvh: int,
    rep: int,
    d: int,                # padded head dim (Dp)
    k_scale: jnp.ndarray | None = None,  # (1,) per-tensor or (KVH, 1, 1)
    v_scale: jnp.ndarray | None = None,  # per-head (attn_head strategy)
    true_d: int | None = None,  # unpadded head dim, for the softmax scale
    layer: int | None = None,  # static layer index for stacked (5D) caches
):
    """Returns (out (B, H, Dp), cache_k, cache_v); caches update in place.

    When the caches are stacked over layers (5D) pass the static ``layer``
    index: the kernel touches only that layer's rows and the returned
    cache arrays alias the inputs, so threading one stacked buffer through
    all layers of a decode step never copies cache bytes (the copy-free
    TPU analogue of the reference's mutate-in-place torch Cache,
    ref modeling/kvcache.py:29-86).
    """
    stacked = cache_k.ndim == 5
    if stacked:
        assert layer is not None
        _, b, _, s_max, dp = cache_k.shape
    else:
        b, _, s_max, dp = cache_k.shape
    # the layer index is a *traced* scalar-prefetch operand: every layer of
    # a stacked cache shares one compiled kernel (22x fewer Mosaic compiles
    # than a static layer index baked into 22 specializations)
    lyr_arr = jnp.asarray(0 if layer is None else layer,
                          jnp.int32).reshape(1)

    # rows per program: amortize the fixed grid-step cost (~0.4us of
    # latency-bound small dots + orchestration per row at 1 row/program)
    # over several rows, bounded by the VMEM block budget.
    row_bytes = kvh * s_max * dp * jnp.dtype(cache_k.dtype).itemsize
    g_rows = 1
    for cand in (16, 8, 4, 2):
        if b % cand == 0 and cand * row_bytes <= 2 * 1024 * 1024:
            g_rows = cand
            break

    if stacked:
        cache_block = (1, g_rows, kvh, s_max, dp)
        cache_index = (  # noqa: E731
            lambda i, lens_ref, lyr_ref: (lyr_ref[0], i, 0, 0, 0))
    else:
        cache_block = (g_rows, kvh, s_max, dp)
        cache_index = lambda i, *_: (i, 0, 0, 0)  # noqa: E731
    h = kvh * rep
    compute_dtype = q.dtype
    has_scales = k_scale is not None

    in_specs = [
        pl.BlockSpec((g_rows, h, dp), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g_rows, kvh, dp), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g_rows, kvh, dp), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(cache_block, cache_index, memory_space=pltpu.VMEM),
        pl.BlockSpec(cache_block, cache_index, memory_space=pltpu.VMEM),
    ]
    args = [q, new_k, new_v, cache_k, cache_v]
    if has_scales:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        # normalize to one scale per kv head: per-tensor scalars broadcast,
        # attn_head (KVH, 1, 1) scales flatten (ref initialize.py:303-305)
        args += [jnp.broadcast_to(k_scale.reshape(-1).astype(jnp.float32),
                                  (kvh,)),
                 jnp.broadcast_to(v_scale.reshape(-1).astype(jnp.float32),
                                  (kvh,))]

    align = 32 if jnp.dtype(cache_k.dtype).itemsize == 1 else 8
    span = min(align, s_max)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // g_rows,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((g_rows, h, dp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # cache outputs stay in HBM, aliased onto the inputs: no block
            # write-back; the kernel DMAs only the dirty tile
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((2, g_rows)),  # k/v write-back per row
            # per-program scores/probs staging for the batched softmax
            pltpu.VMEM((g_rows, kvh * rep, kvh * s_max), jnp.float32),
            pltpu.VMEM((g_rows, kvh * rep, kvh * s_max), compute_dtype),
        ],
    )

    # the kernel kernel-body block for the VMEM cache input of the stacked
    # layout has a leading layer axis of size 1; drop it via static index 0
    inv_sqrt_d = 1.0 / float(np.sqrt(true_d if true_d is not None else dp))
    kernel = _make_kernel(kvh, rep, dp, s_max, cache_k.dtype, compute_dtype,
                          has_scales, inv_sqrt_d, stacked, g_rows)
    if stacked:
        inner = kernel

        def kernel(lens_ref, lyr_ref, *refs):  # noqa: F811
            if has_scales:
                (q_ref, newk_ref, newv_ref, ck_ref, cv_ref, ks, vs,
                 out_ref, ck_hbm, cv_hbm, *scratch) = refs
                inner(lens_ref, lyr_ref, q_ref, newk_ref, newv_ref,
                      ck_ref.at[0], cv_ref.at[0], ks, vs,
                      out_ref, ck_hbm, cv_hbm, *scratch)
            else:
                (q_ref, newk_ref, newv_ref, ck_ref, cv_ref,
                 out_ref, ck_hbm, cv_hbm, *scratch) = refs
                inner(lens_ref, lyr_ref, q_ref, newk_ref, newv_ref,
                      ck_ref.at[0], cv_ref.at[0],
                      out_ref, ck_hbm, cv_hbm, *scratch)

    # alias the caches: operand index counts the scalar-prefetch args first
    aliases = {5: 1, 6: 2}

    out, ck, cv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, dp), compute_dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ),
        input_output_aliases=aliases,
        interpret=_interpret(),
    )(lengths, lyr_arr, *args)
    return out, ck, cv
