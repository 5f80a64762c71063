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
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_attention"]


def _interpret() -> bool:
    if os.environ.get("CT_TPU_PALLAS_INTERPRET", "") == "1":
        return True
    return jax.default_backend() not in ("tpu",)


def _make_kernel(kvh: int, rep: int, d: int, s_max: int, cache_dtype,
                 compute_dtype, has_scales: bool, inv_sqrt_d: float,
                 stacked: bool, layer: int | None):
    def kernel(lens_ref, *refs):
        if has_scales:
            (q_ref, newk_ref, newv_ref, ck_ref, cv_ref, kscale_ref,
             vscale_ref, out_ref, ck_hbm, cv_hbm,
             stage_k, stage_v, sem, actives_ref) = refs
            k_scale = kscale_ref[0]
            v_scale = vscale_ref[0]
        else:
            (q_ref, newk_ref, newv_ref, ck_ref, cv_ref,
             out_ref, ck_hbm, cv_hbm,
             stage_k, stage_v, sem, actives_ref) = refs
            k_scale = v_scale = None
        b = pl.program_id(0)
        length = lens_ref[b]
        active = length >= 0
        wpos = jnp.maximum(length, 0)
        h = kvh * rep
        ks = kvh * s_max

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

        def dequant(v, scale):
            if scale is not None and v.dtype != compute_dtype:
                return (v.astype(jnp.float32)
                        * scale.astype(jnp.float32)).astype(compute_dtype)
            return v.astype(compute_dtype)

        # All kv heads fold into a single (h, kvh*s) score matrix: the
        # cache block (kvh, s, d) is viewed as (kvh*s, d) (a free reshape —
        # merged leading dims, s % 8 == 0), one MXU dot computes every
        # (query-head, key) pair, and a block-diagonal mask keeps only
        # same-group pairs. kvh-times redundant MXU work, but it turns
        # 2*kvh tiny latency-bound dots per program into 2 larger ones.
        row_of = jax.lax.broadcasted_iota(jnp.int32, (ks, d), 0)
        write_mask = jax.lax.rem(row_of, s_max) == length

        new_k = quantize_new(
            jnp.broadcast_to(newk_ref[0][:, None, :], (kvh, s_max, d))
            .reshape(ks, d),
            k_scale,
        )
        new_v = quantize_new(
            jnp.broadcast_to(newv_ref[0][:, None, :], (kvh, s_max, d))
            .reshape(ks, d),
            v_scale,
        )
        ckv = ck_ref[0].reshape(ks, d)
        cvv = cv_ref[0].reshape(ks, d)
        ckv = jnp.where(write_mask, new_k, ckv)
        cvv = jnp.where(write_mask, new_v, cvv)
        # overlay the new token into the VMEM input block (no effect on
        # HBM yet; inactive rows keep the old value via the mask)
        ck_ref[0] = ckv.reshape(kvh, s_max, d)
        cv_ref[0] = cvv.reshape(kvh, s_max, d)

        keys = dequant(ckv, k_scale)      # (kvh*s, Dp)
        values = dequant(cvv, v_scale)    # (kvh*s, Dp)
        qh = q_ref[0].astype(compute_dtype)  # (h, Dp)

        scores = jax.lax.dot_general(
            qh, keys,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * inv_sqrt_d  # (h, kvh*s)

        qrow = jax.lax.broadcasted_iota(jnp.int32, (h, ks), 0)
        kcol = jax.lax.broadcasted_iota(jnp.int32, (h, ks), 1)
        same_group = (qrow // rep) == (kcol // s_max)
        valid = jax.lax.rem(kcol, s_max) <= length
        scores = jnp.where(same_group & valid, scores, -1e30)

        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
            compute_dtype
        )  # zero outside the block diagonal, so the dot re-separates heads

        out_h = jax.lax.dot_general(
            probs, values,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (h, Dp)
        out_ref[0] = out_h.astype(out_ref.dtype)

        # DMA back only the sublane-tile containing the new-token row (DMA
        # slices must be tile-aligned; the rest of the tile holds unchanged
        # data so rewriting it is a no-op). The dirty tile is staged through
        # a double-buffered scratch so the DMA overlaps the next programs'
        # compute — waits are deferred by two programs instead of stalling
        # inline. Inactive rows write nothing.
        align = 32 if jnp.dtype(cache_dtype).itemsize == 1 else 8
        wstart = jnp.minimum((wpos // align) * align,
                             jnp.int32(max(s_max - align, 0)))
        wstart = pl.multiple_of(wstart, align)
        span = min(align, s_max)
        if stacked:
            dst_k = ck_hbm.at[layer, b, :, pl.ds(wstart, span), :]
            dst_v = cv_hbm.at[layer, b, :, pl.ds(wstart, span), :]
        else:
            dst_k = ck_hbm.at[b, :, pl.ds(wstart, span), :]
            dst_v = cv_hbm.at[b, :, pl.ds(wstart, span), :]

        slot = jax.lax.rem(b, 2)
        nprog = pl.num_programs(0)

        def _wait(slot_idx):
            # transfer sizes are identical across programs, so a descriptor
            # built from the current refs decrements the right amount
            pltpu.make_async_copy(
                stage_k.at[0], dst_k, sem.at[slot_idx, 0]
            ).wait()
            pltpu.make_async_copy(
                stage_v.at[0], dst_v, sem.at[slot_idx, 1]
            ).wait()

        # before reusing this slot's stage buffers, drain the DMA issued
        # two programs ago (actives_ref tracks whether one was issued)
        @pl.when((b >= 2) & (actives_ref[slot] == 1))
        def _():
            _wait(slot)

        @pl.when(active)
        def _():
            stage_k[slot] = ck_ref[0, :, pl.ds(wstart, span), :]
            stage_v[slot] = cv_ref[0, :, pl.ds(wstart, span), :]
            pltpu.make_async_copy(stage_k.at[slot], dst_k,
                                  sem.at[slot, 0]).start()
            pltpu.make_async_copy(stage_v.at[slot], dst_v,
                                  sem.at[slot, 1]).start()

        actives_ref[slot] = jnp.where(active, 1, 0)

        # last program drains everything still in flight
        @pl.when(b == nprog - 1)
        def _():
            @pl.when((nprog >= 2) & (actives_ref[1 - slot] == 1))
            def _():
                _wait(1 - slot)

            @pl.when(actives_ref[slot] == 1)
            def _():
                _wait(slot)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kvh", "rep", "d", "true_d", "layer"),
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
    k_scale: jnp.ndarray | None = None,  # (1,) per-tensor
    v_scale: jnp.ndarray | None = None,
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
        cache_block = (1, 1, kvh, s_max, dp)
        lyr = layer
        cache_index = lambda i, *_: (lyr, i, 0, 0, 0)  # noqa: E731
    else:
        b, _, s_max, dp = cache_k.shape
        cache_block = (1, kvh, s_max, dp)
        cache_index = lambda i, *_: (i, 0, 0, 0)  # noqa: E731
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
        pl.BlockSpec(cache_block, cache_index, memory_space=pltpu.VMEM),
        pl.BlockSpec(cache_block, cache_index, memory_space=pltpu.VMEM),
    ]
    args = [q, new_k, new_v, cache_k, cache_v]
    if has_scales:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        args += [k_scale.reshape(1).astype(jnp.float32),
                 v_scale.reshape(1).astype(jnp.float32)]

    align = 32 if jnp.dtype(cache_k.dtype).itemsize == 1 else 8
    span = min(align, s_max)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, h, dp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # cache outputs stay in HBM, aliased onto the inputs: no block
            # write-back; the kernel DMAs only the dirty tile
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, kvh, span, dp), cache_k.dtype),  # stage_k
            pltpu.VMEM((2, kvh, span, dp), cache_k.dtype),  # stage_v
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SMEM((2,), jnp.int32),                    # issued flags
        ],
    )

    # the kernel kernel-body block for the VMEM cache input of the stacked
    # layout has a leading layer axis of size 1; drop it via static index 0
    inv_sqrt_d = 1.0 / float(np.sqrt(true_d if true_d is not None else dp))
    kernel = _make_kernel(kvh, rep, dp, s_max, cache_k.dtype, compute_dtype,
                          has_scales, inv_sqrt_d, stacked, layer)
    if stacked:
        inner = kernel

        def kernel(lens_ref, *refs):  # noqa: F811
            if has_scales:
                (q_ref, newk_ref, newv_ref, ck_ref, cv_ref, ks, vs,
                 out_ref, ck_hbm, cv_hbm, *scratch) = refs
                inner(lens_ref, q_ref, newk_ref, newv_ref,
                      ck_ref.at[0], cv_ref.at[0], ks, vs,
                      out_ref, ck_hbm, cv_hbm, *scratch)
            else:
                (q_ref, newk_ref, newv_ref, ck_ref, cv_ref,
                 out_ref, ck_hbm, cv_hbm, *scratch) = refs
                inner(lens_ref, q_ref, newk_ref, newv_ref,
                      ck_ref.at[0], cv_ref.at[0],
                      out_ref, ck_hbm, cv_hbm, *scratch)

    # alias the caches: operand index counts the scalar-prefetch arg first
    aliases = {4: 1, 5: 2}

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
    )(lengths, *args)
    return out, ck, cv
