"""Fused decode attention Pallas kernel (single query step, quantized KV).

One kernel per layer per decode step replaces the whole attention tail
(cache scatter, GQA einsums, masking, softmax, weighted sum): per batch row
it appends the new post-RoPE K/V into the cache *in place*
(input_output_aliases — the KV cache never copies), then computes
grouped-query attention over the valid prefix.

Cache layout is head-major (B, KVH, S_pad, Dp) with head_dim padded to the
128-lane width and the sequence on sublanes: every per-head access is a
static leading index, so the kernel contains no lane-splitting reshapes,
slices, or concats (none of which Mosaic can lower). Padding lanes are
zero, contribute nothing to the dots, and are free on fp8 caches (same
bytes as an unpadded bf16 cache).

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
                 compute_dtype, has_scales: bool, inv_sqrt_d: float):
    def kernel(lens_ref, *refs):
        if has_scales:
            (q_ref, newk_ref, newv_ref, ck_ref, cv_ref, kscale_ref,
             vscale_ref, out_ref, ck_out, cv_out) = refs
            k_scale = kscale_ref[0]
            v_scale = vscale_ref[0]
        else:
            (q_ref, newk_ref, newv_ref, ck_ref, cv_ref,
             out_ref, ck_out, cv_out) = refs
            k_scale = v_scale = None
        b = pl.program_id(0)
        length = lens_ref[b]

        t_col = jax.lax.broadcasted_iota(jnp.int32, (s_max, d), 0)
        write_mask = t_col == length
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (rep, s_max), 1)
        smask = s_iota <= length

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

        for kv in range(kvh):  # static head loop; all ops full-width
            new_k = quantize_new(newk_ref[0, kv, :][None, :], k_scale)
            new_v = quantize_new(newv_ref[0, kv, :][None, :], v_scale)
            ck_out[0, kv] = jnp.where(write_mask, new_k, ck_ref[0, kv])
            cv_out[0, kv] = jnp.where(write_mask, new_v, cv_ref[0, kv])

            keys = dequant(ck_out[0, kv], k_scale)      # (S, Dp)
            values = dequant(cv_out[0, kv], v_scale)    # (S, Dp)
            q_k = q_ref[0, kv * rep:(kv + 1) * rep, :].astype(
                compute_dtype
            )  # (rep, Dp)

            scores = jax.lax.dot_general(
                q_k, keys,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * inv_sqrt_d  # (rep, S)

            scores = jnp.where(smask, scores, -1e30)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(
                compute_dtype
            )

            out_k = jax.lax.dot_general(
                probs, values,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (rep, Dp)
            out_ref[0, kv * rep:(kv + 1) * rep, :] = out_k.astype(
                out_ref.dtype
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kvh", "rep", "d", "true_d"),
)
def decode_attention(
    q: jnp.ndarray,        # (B, H, Dp) post-RoPE queries (lane-padded)
    new_k: jnp.ndarray,    # (B, KVH, Dp) post-RoPE keys for this step
    new_v: jnp.ndarray,    # (B, KVH, Dp)
    cache_k: jnp.ndarray,  # (B, KVH, S_pad, Dp) cache dtype
    cache_v: jnp.ndarray,
    lengths: jnp.ndarray,  # (B,) int32
    kvh: int,
    rep: int,
    d: int,                # padded head dim (Dp)
    k_scale: jnp.ndarray | None = None,  # (1,) per-tensor
    v_scale: jnp.ndarray | None = None,
    true_d: int | None = None,  # unpadded head dim, for the softmax scale
):
    """Returns (out (B, H, Dp), cache_k, cache_v); caches update in place."""
    b, _, s_max, dp = cache_k.shape
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
        pl.BlockSpec((1, kvh, s_max, dp), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kvh, s_max, dp), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, new_k, new_v, cache_k, cache_v]
    if has_scales:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        args += [k_scale.reshape(1).astype(jnp.float32),
                 v_scale.reshape(1).astype(jnp.float32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, h, dp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, s_max, dp), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, s_max, dp), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )

    inv_sqrt_d = 1.0 / float(np.sqrt(true_d if true_d is not None else dp))
    kernel = _make_kernel(kvh, rep, dp, s_max, cache_k.dtype, compute_dtype,
                          has_scales, inv_sqrt_d)

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
