"""Functional JAX Llama-family model consuming compressed-tensors
checkpoints run-compressed.

There is no counterpart in the reference (it has no model definitions — it
delegates execution to transformers/vLLM); this is the engine side demanded
by BASELINE.json. Every linear is a `QuantizedTensor` and calls
`quantized_matmul`, so weights stay compressed in HBM.

KV-cache quantization consumes the reference's serialized `k_scale`/`v_scale`
attention parameters (ref modeling/kvcache.py:29-86, quant_metadata.py:13-16);
quantization happens post-RoPE, matching the reference hook placement
(ref modeling/attention.py:65).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from compressed_tensors_tpu.models.config import LlamaConfig
from compressed_tensors_tpu.ops.linear import (
    QuantizedTensor,
    from_compressed_state,
    materialize_weight,
    quantized_matmul,
)

__all__ = [
    "LlamaConfig",
    "llama_forward",
    "init_kv_cache",
    "init_paged_kv_cache",
    "load_llama_params",
    "KVCache",
    "PagedKVCache",
    "transcode_fp8_kv_to_int8",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Dense KV cache with per-slot lengths (continuous batching: every
    batch row is an independent sequence slot). When k_scale/v_scale are
    present the cache stores fp8/int8 values + per-layer scales (cache
    bytes halve), dequantized inside attention."""

    # layout (layers, B, kv_heads, S_pad, Dp): head-major with the sequence
    # on sublanes and head_dim padded to the 128-lane width, so the fused
    # decode-attention kernel addresses each head with static leading
    # indices (no lane-splitting ops, which Mosaic cannot lower)
    k: jnp.ndarray
    v: jnp.ndarray
    lengths: jnp.ndarray  # (B,) int32: valid prefix length per slot

    @property
    def length(self):
        # scalar view for single-sequence callers
        return self.lengths[0]

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def padded_head_dim(d: int) -> int:
    return max(128, int(np.ceil(d / 128) * 128))


def kv_pack_factor(config: "LlamaConfig", head_pack: bool | None = None) -> int:
    """How many KV heads share one 128-lane cache row.

    Models with head_dim <= 64 waste >= half of every (8, 128) HBM tile if
    each head gets its own lane-padded row; packing P = 128/slot adjacent
    heads of the same token into one row halves (quarters) cache bytes AND
    the folded score-dot width — and the decode kernels run UNCHANGED with
    kvh' = KVH/P, rep' = rep*P, because each query head's lanes select its
    own head's slot (zeros elsewhere contribute nothing to the dots).

    Per-head (attn_head) k/v scales vary along lanes in this layout, which
    the kernels' per-kv-row scales cannot express — callers with per-head
    scales pass head_pack=False (the jnp paths handle both).
    """
    if head_pack is False or config.is_mla:
        return 1
    d = config.head_dim
    if d > 64:
        return 1
    slot = 32 if d <= 32 else 64
    p = 128 // slot
    while p > 1 and config.num_key_value_heads % p:
        p //= 2
    return p


def _pack_kv_heads(t: jnp.ndarray, p: int, slot: int, dp: int) -> jnp.ndarray:
    """(B, S, KVH, D) -> (B, S, KVH/P, Dp): P adjacent heads of one token
    share a lane row (free reshape — the packed dims are contiguous)."""
    B, S, KVH, D = t.shape
    t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, slot - D)))
    t = t.reshape(B, S, KVH // p, p * slot)
    if p * slot < dp:
        t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, dp - p * slot)))
    return t


def _unpack_kv_heads(view: jnp.ndarray, p: int, slot: int, D: int
                     ) -> jnp.ndarray:
    """(B, KVH/P, T, Dp) cache view -> (B, KVH, T, D)."""
    B, kvhs, T, _ = view.shape
    a = view[..., :p * slot].reshape(B, kvhs, T, p, slot)
    a = a.transpose(0, 1, 3, 2, 4).reshape(B, kvhs * p, T, slot)
    return a[..., :D]


def _slot_queries(q: jnp.ndarray, p: int, slot: int, dp: int, rep: int
                  ) -> jnp.ndarray:
    """(B, H, D) -> (B, H, Dp): head of kv-group g gets lanes
    [(g % P) * slot, ...); zero lanes elsewhere make the packed score dot
    pick out exactly its own head's keys."""
    B, H, D = q.shape
    if p == 1:
        return jnp.pad(q, ((0, 0), (0, 0), (0, dp - D)))
    kvhs = H // (rep * p)
    qr = jnp.pad(q, ((0, 0), (0, 0), (0, slot - D)))
    qr = qr.reshape(B, kvhs, p, rep, slot)
    eye = jnp.eye(p, dtype=q.dtype)
    qe = jnp.einsum("bkprd,pq->bkprqd", qr, eye).reshape(B, H, p * slot)
    if p * slot < dp:
        qe = jnp.pad(qe, ((0, 0), (0, 0), (0, dp - p * slot)))
    return qe


def _unslot_outputs(out: jnp.ndarray, p: int, slot: int, D: int, rep: int
                    ) -> jnp.ndarray:
    """(B, H, Dp) packed attention outputs -> (B, H, D): each head keeps
    its own lane slot (the other slots hold sibling heads' outputs)."""
    B, H, _ = out.shape
    if p == 1:
        return out[..., :D]
    kvhs = H // (rep * p)
    o = out[..., :p * slot].reshape(B, kvhs, p, rep, p, slot)
    eye = jnp.eye(p, dtype=out.dtype)
    o = jnp.einsum("bkprqd,pq->bkprd", o, eye)
    return o.reshape(B, H, slot)[..., :D]


def transcode_fp8_kv_to_int8(params: dict, cache_dtype):
    """Serve fp8-KV checkpoints with an int8 cache on chips without fp8
    conversion hardware.

    On v5e the fp8_e4m3 -> bf16 VPU convert is emulated bitwise and costs
    ~5x the whole attention kernel (measured 8.2 vs 1.2 ms/step at 8B
    bs64); int8 -> bf16 is native and an int8 cache is *faster* than bf16
    (half the DMA bytes). The serialized k_scale/v_scale semantics are
    preserved by re-gridding: the checkpoint scale s maps x -> x/s onto
    the fp8 lattice (max 448); the int8 cache stores x/(s*448/127) so the
    same dynamic range covers the int8 lattice (max 127).

    :param params: llama params pytree holding per-layer k_scale/v_scale
    :param cache_dtype: the requested cache dtype
    :return: (params, cache_dtype) — rescaled copies + jnp.int8 when the
        transcode applies, unchanged otherwise
    """
    from compressed_tensors_tpu.ops.linear import _transcode_fp8_enabled

    if cache_dtype is None or not str(
            jnp.dtype(cache_dtype)).startswith("float8"):
        return params, cache_dtype
    if not _transcode_fp8_enabled():
        return params, cache_dtype
    ratio = 448.0 / 127.0
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        new_layer = dict(layer)
        for key in ("k_scale", "v_scale"):
            if layer.get(key) is not None:
                new_layer[key] = (layer[key].astype(jnp.float32)
                                  * ratio).astype(layer[key].dtype)
        out["layers"].append(new_layer)
    return out, jnp.int8


def init_kv_cache(
    config: LlamaConfig,
    batch: int,
    max_len: int,
    dtype=jnp.bfloat16,
    cache_dtype=None,
    head_pack: bool | None = None,
) -> KVCache:
    """:param head_pack: pack P = 128/head_slot adjacent KV heads per
    128-lane cache row when head_dim <= 64 (halves/quarters cache HBM
    traffic; see kv_pack_factor). Default auto; pass False for models
    with per-head (attn_head) k/v scales that must ride the fused
    kernels."""
    cd = cache_dtype or dtype
    # align to the flash-decode chunk size (also covers the 8/32-row
    # write-back tile alignment); the flash kernel's per-row cost is
    # O(length), so allocation slack costs only empty grid steps
    align = 64
    s_pad = int(np.ceil(max_len / align) * align)
    if config.is_mla:
        # MLA caches one latent "head" per token: [c_kv ; k_pe]
        kvh = 1
        dp = padded_head_dim(config.kv_lora_rank + config.qk_rope_head_dim)
    else:
        p = kv_pack_factor(config, head_pack)
        kvh = config.num_key_value_heads // p
        dp = padded_head_dim(config.head_dim) if p == 1 else 128
    shape = (config.num_hidden_layers, batch, kvh, s_pad, dp)
    return KVCache(
        k=jnp.zeros(shape, dtype=cd),
        v=jnp.zeros(shape, dtype=cd),
        lengths=jnp.zeros((batch,), dtype=jnp.int32),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """vLLM-style paged KV cache: a global page pool with per-sequence page
    tables. Cache HBM is allocated in fixed pages on demand (engine-side
    free list) instead of a max_len slab per slot. Page 0 is the null page:
    unallocated table entries and inactive rows point at it; its contents
    are garbage and never read into a live sequence."""

    k: jnp.ndarray        # (L, NP, KVH, page, Dp) pool
    v: jnp.ndarray
    tables: jnp.ndarray   # (B, P_max) int32 page ids
    lengths: jnp.ndarray  # (B,) int32 valid prefix length per sequence

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def max_len(self) -> int:
        return self.tables.shape[1] * self.k.shape[3]


def init_paged_kv_cache(
    config: LlamaConfig,
    batch: int,
    max_len: int,
    num_pages: int | None = None,
    page_size: int = 64,
    dtype=jnp.bfloat16,
    cache_dtype=None,
    head_pack: bool | None = None,
) -> PagedKVCache:
    """:param num_pages: pool size (default: full residency for `batch`
    sequences of `max_len` + the null page — no oversubscription). Serving
    engines pass less to oversubscribe HBM.
    :param head_pack: see init_kv_cache."""
    cd = cache_dtype or dtype
    p_max = int(np.ceil(max_len / page_size))
    if num_pages is None:
        num_pages = batch * p_max + 1
    if config.is_mla:
        # MLA pages hold one latent "head" per token: [c_kv ; k_pe]
        kvh = 1
        dp = padded_head_dim(config.kv_lora_rank + config.qk_rope_head_dim)
    else:
        pk = kv_pack_factor(config, head_pack)
        kvh = config.num_key_value_heads // pk
        dp = padded_head_dim(config.head_dim) if pk == 1 else 128
    shape = (config.num_hidden_layers, num_pages, kvh, page_size, dp)
    return PagedKVCache(
        k=jnp.zeros(shape, dtype=cd),
        v=jnp.zeros(shape, dtype=cd),
        tables=jnp.zeros((batch, p_max), dtype=jnp.int32),
        lengths=jnp.zeros((batch,), dtype=jnp.int32),
    )


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def _rope(positions: jnp.ndarray, head_dim: int, theta: float):
    """Rotary embeddings (half-rotation layout, HF llama convention)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (B, S, hd/2)
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    return cos, sin


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    # x: (B, S, H, D); cos/sin: (B, S, D/2)
    d = x.shape[-1] // 2
    x1, x2 = x[..., :d], x[..., d:]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


def _cache_scale(scale, x_ndim, head_axis):
    """Broadcastable view of a cache scale: scalar per-tensor, or per-head
    (attn_head strategy, serialized as (KVH, 1, 1)) aligned to the kv-head
    axis of the tensor being (de)quantized."""
    if scale.size == 1:
        return scale.reshape(()).astype(jnp.float32)
    shape = [1] * x_ndim
    shape[head_axis] = scale.size
    return scale.reshape(shape).astype(jnp.float32)


def _quantize_to_cache(x, scale, cache_dtype, head_axis=2):
    """Quantize post-RoPE K/V into the cache representation using the
    serialized k_scale/v_scale (per-tensor or per-head fp8/int8). `x` has
    the kv-head axis at `head_axis` ((B, S, KVH, Dp) layouts pass 2)."""
    if scale is None or cache_dtype == x.dtype:
        return x.astype(cache_dtype)
    s = _cache_scale(scale, x.ndim, head_axis)
    scaled = x.astype(jnp.float32) / s
    if str(cache_dtype).startswith("float8"):
        return scaled.astype(cache_dtype)
    # int8 cache
    return jnp.clip(jnp.round(scaled), -128, 127).astype(cache_dtype)


def _dequantize_from_cache(x, scale, dtype, head_axis=1):
    """Inverse of _quantize_to_cache; cache views are (B, KVH, T, Dp), so
    the kv-head axis defaults to 1."""
    if scale is None or x.dtype == dtype:
        return x.astype(dtype)
    s = _cache_scale(scale, x.ndim, head_axis)
    return (x.astype(jnp.float32) * s).astype(dtype)


def _attention(
    layer: dict,
    layer_idx: int,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    kv_k_all: jnp.ndarray,  # (L, B, KVH, S_pad, Dp) full stacked cache
    kv_v_all: jnp.ndarray,
    cache_lens: jnp.ndarray,  # (B,) per-slot valid lengths
    config: LlamaConfig,
    positions: jnp.ndarray,  # (B, S) query positions
    fresh_prefill: bool = False,  # static: cache is known-empty (lens all 0)
    tables: jnp.ndarray | None = None,  # (B, P) page tables (paged cache)
    use_kernels: bool = True,  # static: fused Pallas kernel paths
):
    B, S, _ = x.shape
    H = config.num_attention_heads
    KVH = config.num_key_value_heads
    D = config.head_dim

    if "qkv_proj" in layer:
        qkv = quantized_matmul(x, layer["qkv_proj"], use_kernels)
        s1, s2 = layer["qkv_splits"].value
        q = qkv[..., :s1].reshape(B, S, H, D)
        k = qkv[..., s1:s2].reshape(B, S, KVH, D)
        v = qkv[..., s2:].reshape(B, S, KVH, D)
    else:
        q = quantized_matmul(x, layer["q_proj"], use_kernels).reshape(B, S, H, D)
        k = quantized_matmul(x, layer["k_proj"], use_kernels).reshape(B, S, KVH, D)
        v = quantized_matmul(x, layer["v_proj"], use_kernels).reshape(B, S, KVH, D)

    # Qwen3-style per-head q/k RMSNorm (over head_dim, before RoPE)
    if "q_norm" in layer:
        q = rms_norm(q, layer["q_norm"], config.rms_norm_eps)
    if "k_norm" in layer:
        k = rms_norm(k, layer["k_norm"], config.rms_norm_eps)

    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)

    # post-RoPE query quantization hook point (ref attention.py:65);
    # q is (B, S, H, D) — per-head (attn_head) scales align on axis 2
    q_scale = layer.get("q_scale")
    if q_scale is not None:
        s = _cache_scale(q_scale, q.ndim, head_axis=2)
        q = (q.astype(jnp.float32) / s).astype(
            jnp.float8_e4m3fn).astype(jnp.float32) * s
        q = q.astype(x.dtype)

    k_scale = layer.get("k_scale")
    v_scale = layer.get("v_scale")
    cache_dtype = kv_k_all.dtype
    # both scales present/absent together, and for the per-tensor-only
    # kernels both must be scalars (attn_head per-head scales are handled
    # by the block decode kernel and the jnp paths)
    scales_ok = (k_scale is None) == (v_scale is None)
    scalar_scales = scales_ok and (k_scale is None or
                                   (k_scale.size == 1 and v_scale.size == 1))

    # fused decode path: one Pallas op does the cache append (in place) +
    # GQA attention for single-token steps. The stacked cache buffer is
    # aliased through the kernel, so no cache bytes are copied.
    # Head-packed layouts (P adjacent KV heads per 128-lane row, see
    # kv_pack_factor) ride the same kernels with kvh' = KVH/P and
    # rep' = rep*P: lane-slotted queries select their own head's keys.
    Dp = kv_k_all.shape[-1]  # lane-padded head dim (cache layout)
    KVHs = kv_k_all.shape[2]  # stored kv rows per token (= KVH / pack)
    P = KVH // KVHs
    slot = Dp // P
    rep_s = H // KVHs

    if tables is not None and S == 1 and use_kernels and scalar_scales:
        from compressed_tensors_tpu.ops.kernels.paged_decode import (
            paged_decode_attention,
        )

        out, ck, cv = paged_decode_attention(
            _slot_queries(q[:, 0], P, slot, Dp, H // KVH),  # (B, H, Dp)
            _pack_kv_heads(k, P, slot, Dp)[:, 0],           # (B, KVHs, Dp)
            _pack_kv_heads(v, P, slot, Dp)[:, 0],
            kv_k_all, kv_v_all, tables, cache_lens,
            kvh=KVHs, rep=rep_s, d=Dp, true_d=D,
            k_scale=k_scale, v_scale=v_scale, layer=layer_idx,
        )
        out = _unslot_outputs(out, P, slot, D, H // KVH)
        out = out.reshape(B, S, H * D).astype(x.dtype)
        return quantized_matmul(out, layer["o_proj"], use_kernels), ck, cv

    if tables is not None:
        # paged prefill / eager path: gather the rows' pages into a
        # contiguous per-row view, run the dense logic, scatter the pages
        # back. Costs one pool gather+scatter per layer — prefill-only
        # traffic; decode uses the paged kernel above.
        NPt = tables.shape[1]
        page = kv_k_all.shape[3]
        gk = jnp.take(kv_k_all[layer_idx], tables, axis=0)  # (B,NPt,KVHs,pg,Dp)
        gv = jnp.take(kv_v_all[layer_idx], tables, axis=0)
        dense_k = gk.transpose(0, 2, 1, 3, 4).reshape(B, KVHs, NPt * page, Dp)
        dense_v = gv.transpose(0, 2, 1, 3, 4).reshape(B, KVHs, NPt * page, Dp)
        out, nk, nv = _attention_dense_tail(
            layer, x, q, k, v, dense_k, dense_v, cache_lens, config,
            positions, fresh_prefill, k_scale, v_scale, use_kernels)
        # scatter back (duplicate table ids only ever reference the null
        # page 0, whose contents are garbage by contract)
        nk_pages = nk.reshape(B, KVHs, NPt, page, Dp).transpose(0, 2, 1, 3, 4)
        nv_pages = nv.reshape(B, KVHs, NPt, page, Dp).transpose(0, 2, 1, 3, 4)
        flat_idx = tables.reshape(-1)
        pool_k = kv_k_all[layer_idx].at[flat_idx].set(
            nk_pages.reshape(B * NPt, KVHs, page, Dp))
        pool_v = kv_v_all[layer_idx].at[flat_idx].set(
            nv_pages.reshape(B * NPt, KVHs, page, Dp))
        kv_k_all = jax.lax.dynamic_update_index_in_dim(kv_k_all, pool_k,
                                                       layer_idx, 0)
        kv_v_all = jax.lax.dynamic_update_index_in_dim(kv_v_all, pool_v,
                                                       layer_idx, 0)
        return out, kv_k_all, kv_v_all

    if S == 1 and use_kernels and scales_ok:
        from compressed_tensors_tpu.flags import FLAGS

        # kernel choice: the block kernel auto-pipelines the whole allocated
        # cache row (best when the allocation is small/tight); the flash
        # kernel touches O(current length) chunks (wins when the allocation
        # is serving-scale, i.e. much larger than typical lengths). Only the
        # block kernel consumes per-head (attn_head) scales.
        s_max = kv_k_all.shape[3]
        attn_sel = FLAGS.decode_attn
        use_flash = scalar_scales and s_max % 64 == 0 and (
            attn_sel == "flash" or (attn_sel == "auto" and s_max >= 512)
        )
        # per-head (attn_head) scales only compose with the block kernel
        # on unpacked layouts (their per-kv-row scales cannot vary along
        # lanes); init the cache with head_pack=False for that case
        if not scalar_scales and P > 1:
            pass  # fall through to the jnp path below
        else:
            q_s = _slot_queries(q[:, 0], P, slot, Dp, H // KVH)
            nk = _pack_kv_heads(k, P, slot, Dp)[:, 0]
            nv = _pack_kv_heads(v, P, slot, Dp)[:, 0]
            if use_flash:
                from compressed_tensors_tpu.ops.kernels.flash_decode import (
                    flash_decode_attention,
                )

                out, ck, cv = flash_decode_attention(
                    q_s, nk, nv, kv_k_all, kv_v_all, cache_lens,
                    kvh=KVHs, rep=rep_s, d=Dp, true_d=D,
                    k_scale=k_scale, v_scale=v_scale, layer=layer_idx,
                )
            else:
                from compressed_tensors_tpu.ops.kernels.decode_attention import (  # noqa: E501
                    decode_attention,
                )

                out, ck, cv = decode_attention(
                    q_s, nk, nv, kv_k_all, kv_v_all, cache_lens,
                    kvh=KVHs, rep=rep_s, d=Dp, true_d=D,
                    k_scale=k_scale, v_scale=v_scale, layer=layer_idx,
                )
            out = _unslot_outputs(out, P, slot, D, H // KVH)
            out = out.reshape(B, S, H * D).astype(x.dtype)
            return (quantized_matmul(out, layer["o_proj"], use_kernels),
                    ck, cv)

    # dense (per-slot slab) cache: run the shared tail on this layer's
    # (B, KVH, S_pad, Dp) slice and write it back into the stacked buffer
    out, kv_k, kv_v = _attention_dense_tail(
        layer, x, q, k, v, kv_k_all[layer_idx], kv_v_all[layer_idx],
        cache_lens, config, positions, fresh_prefill, k_scale, v_scale,
        use_kernels)
    kv_k_all = jax.lax.dynamic_update_index_in_dim(kv_k_all, kv_k,
                                                   layer_idx, 0)
    kv_v_all = jax.lax.dynamic_update_index_in_dim(kv_v_all, kv_v,
                                                   layer_idx, 0)
    return out, kv_k_all, kv_v_all


def _attention_dense_tail(
    layer: dict,
    x: jnp.ndarray,
    q: jnp.ndarray,  # (B, S, H, D) post-RoPE
    k: jnp.ndarray,  # (B, S, KVH, D) post-RoPE
    v: jnp.ndarray,
    cache_k_l: jnp.ndarray,  # (B, KVH, T, Dp) this layer's contiguous view
    cache_v_l: jnp.ndarray,
    cache_lens: jnp.ndarray,
    config: LlamaConfig,
    positions: jnp.ndarray,
    fresh_prefill: bool,
    k_scale,
    v_scale,
    use_kernels: bool = True,
):
    """K/V write + attention over a contiguous per-row cache view. Shared
    by the dense cache (the view IS the cache slice) and the paged cache's
    prefill/eager path (the view is gathered from / scattered to pages)."""
    B, S, H, D = q.shape
    KVH = config.num_key_value_heads
    Dp = cache_k_l.shape[-1]
    KVHs = cache_k_l.shape[1]   # stored rows per token (= KVH / pack)
    P = KVH // KVHs
    slot = Dp // P
    cache_dtype = cache_k_l.dtype

    # write new K/V into each slot at its own offset [len_b, len_b + S):
    # cache layout (B, KVHs, T, Dp). Quantization happens on the UNPACKED
    # (B, S, KVH, slot) view (per-head scales align on axis 2), then P
    # adjacent heads pack into one lane row (free reshape).
    pad = [(0, 0)] * 3 + [(0, slot - D)]
    k_q = _quantize_to_cache(jnp.pad(k, pad), k_scale, cache_dtype)
    v_q = _quantize_to_cache(jnp.pad(v, pad), v_scale, cache_dtype)
    k_c = _pack_kv_heads(k_q, P, slot, Dp).transpose(0, 2, 1, 3)
    v_c = _pack_kv_heads(v_q, P, slot, Dp).transpose(0, 2, 1, 3)
    # rows with a negative length are inactive slots (serving engine
    # sentinel): their K/V writes are skipped entirely
    if fresh_prefill:
        # active rows are statically at offset 0: ONE static-offset update
        # of the [0, S) slice (inactive rows keep their bytes via a masked
        # select over just that slice). The general path below vmaps a
        # per-row dynamic_update_slice, which XLA lowers to a scatter —
        # ~25 ms/step at TinyLlama bs64 prefill, 22 layers x 2 arrays.
        active = (cache_lens >= 0)[:, None, None, None]
        kv_k = jax.lax.dynamic_update_slice(
            cache_k_l, jnp.where(active, k_c, cache_k_l[:, :, :S, :]),
            (0, 0, 0, 0))
        kv_v = jax.lax.dynamic_update_slice(
            cache_v_l, jnp.where(active, v_c, cache_v_l[:, :, :S, :]),
            (0, 0, 0, 0))
    else:
        def _write_row(cache_b, new_b, off):
            upd = jax.lax.dynamic_update_slice(
                cache_b, new_b, (0, jnp.maximum(off, 0), 0)
            )
            return jnp.where(off >= 0, upd, cache_b)

        kv_k = jax.vmap(_write_row)(cache_k_l, k_c, cache_lens)
        kv_v = jax.vmap(_write_row)(cache_v_l, v_c, cache_lens)

    if S > 1 and fresh_prefill:
        # fresh prefill never reads the cache: attend q over only the S
        # new (QDQ'd, pre-pack) keys/values so quantized-cache numerics
        # match what decode reads back (reference quantizes in
        # cache.update, ref kvcache.py:65-66)
        k_a = _dequantize_from_cache(k_q, k_scale, x.dtype,
                                     head_axis=2)[..., :D]
        v_a = _dequantize_from_cache(v_q, v_scale, x.dtype,
                                     head_axis=2)[..., :D]
        if use_kernels and S > 64:
            # flash prefill: streams scores through VMEM instead of
            # materializing (B, KVH, rep, S, S) f32 in HBM — wins once S
            # amortizes its (B, H, S-blocks) kernel grid
            from compressed_tensors_tpu.ops.kernels.prefill_attention import (
                prefill_attention,
            )

            out = prefill_attention(q, k_a, v_a)
        else:
            # short prompts: the (B, KVH, rep, S, S) score tensor is tiny
            # and one fused XLA einsum chain beats thousands of
            # per-(row, head) kernel grid steps (~25 ms/step at bs64 S=16)
            rep_q = H // KVH
            qg = q.reshape(B, S, KVH, rep_q, D)
            scores = jnp.einsum("bskrd,btkd->bkrst", qg, k_a,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(jnp.float32(D))
            causal = jnp.tril(jnp.ones((S, S), bool))
            scores = jnp.where(causal[None, None, None], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            out = jnp.einsum("bkrst,btkd->bskrd", probs, v_a,
                             preferred_element_type=jnp.float32).astype(
                x.dtype)
        out = out.reshape(B, S, H * D).astype(x.dtype)
        return quantized_matmul(out, layer["o_proj"], use_kernels), kv_k, kv_v

    keys = _dequantize_from_cache(
        _unpack_kv_heads(kv_k, P, slot, slot), k_scale, x.dtype)[..., :D]
    values = _dequantize_from_cache(
        _unpack_kv_heads(kv_v, P, slot, slot), v_scale, x.dtype)[..., :D]

    # grouped-query attention without materializing repeated KV heads:
    # fold the query-head groups into the einsum instead of jnp.repeat
    # (an 8x HBM-traffic saving for 32q/4kv models)
    rep = H // KVH
    qg = q.reshape(B, S, KVH, rep, D)

    # (B, S, KVH, rep, D) x (B, KVH, T, D) -> (B, KVH, rep, S, T)
    scores = jnp.einsum("bskrd,bktd->bkrst", qg, keys,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(D))

    T = keys.shape[2]
    q_pos = positions[:, :, None]                 # (B, S, 1)
    k_pos = jnp.arange(T)[None, None, :]          # (1, 1, T)
    valid = cache_lens[:, None, None] + S
    mask = (k_pos <= q_pos) & (k_pos < valid)     # (B, S, T)
    scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)

    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bkrst,bktd->bskrd", probs, values,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(B, S, H * D)
    return quantized_matmul(out, layer["o_proj"], use_kernels), kv_k, kv_v


def _mlp(layer: dict, x: jnp.ndarray, config: LlamaConfig,
         use_kernels: bool = True) -> jnp.ndarray:
    if "moe" in layer:
        from compressed_tensors_tpu.models.moe import moe_mlp

        return moe_mlp(layer, x, config, use_kernels=use_kernels)
    if "gate_up_proj" in layer:
        gu = quantized_matmul(x, layer["gate_up_proj"], use_kernels)
        (split,) = layer["gate_up_split"].value
        gate, up = gu[..., :split], gu[..., split:]
    else:
        gate = quantized_matmul(x, layer["gate_proj"], use_kernels)
        up = quantized_matmul(x, layer["up_proj"], use_kernels)
    return quantized_matmul(jax.nn.silu(gate) * up, layer["down_proj"],
                            use_kernels)


def llama_forward(
    params: dict,
    config: LlamaConfig,
    input_ids: jnp.ndarray,      # (B, S)
    positions: jnp.ndarray,      # (B, S)
    kv_cache: Optional[KVCache] = None,
    fresh_prefill: Optional[bool] = None,
    use_kernels: Optional[bool] = None,
    last_logit_only: bool = False,
):
    """Full forward pass. Returns (logits, updated kv cache).

    :param last_logit_only: compute lm_head logits for the final position
        only (returns (B, 1, V)). Greedy prefill needs just the last
        position's logits; skipping the rest saves S x the lm_head matmul
        and its (B, S, V) HBM writes — the dominant prefill cost for short
        prompts.

    :param fresh_prefill: static hint that every active cache slot is empty
        (lengths 0), enabling the fused flash-prefill kernel. Defaults to
        True when no cache is passed (one is created fresh).
    :param use_kernels: static switch for the fused Pallas kernel paths
        (matmuls and attention). None resolves the environment/backend
        default at trace time; pass an explicit bool for a stable choice
        under jit (tests and A/B harnesses select paths with this).
    """
    if use_kernels is None:
        from compressed_tensors_tpu.ops.linear import _kernel_enabled

        use_kernels = _kernel_enabled()
    embed = params["embed_tokens"]
    if isinstance(embed, QuantizedTensor):
        embed_w = materialize_weight(embed)
    else:
        embed_w = embed
    x = jnp.take(embed_w, input_ids, axis=0)

    B, S = input_ids.shape
    rope_dim = config.qk_rope_head_dim if config.is_mla else config.head_dim
    cos, sin = _rope(positions, rope_dim, config.rope_theta)

    if fresh_prefill is None:
        fresh_prefill = kv_cache is None
    if kv_cache is None:
        kv_cache = init_kv_cache(config, B, S, dtype=x.dtype)
    cache_lens = kv_cache.lengths
    tables = kv_cache.tables if isinstance(kv_cache, PagedKVCache) else None

    # the stacked cache buffers thread through every layer; in the fused
    # decode path each layer's kernel aliases them in place, so the whole
    # step performs zero cache copies
    kv_k_all, kv_v_all = kv_cache.k, kv_cache.v
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_layernorm"], config.rms_norm_eps)
        if config.is_mla:
            from compressed_tensors_tpu.models.mla import mla_attention

            attn_out, kv_k_all, kv_v_all = mla_attention(
                layer, i, h, cos, sin, kv_k_all, kv_v_all, cache_lens,
                config, positions, use_kernels=use_kernels, tables=tables,
            )
        else:
            attn_out, kv_k_all, kv_v_all = _attention(
                layer, i, h, cos, sin, kv_k_all, kv_v_all, cache_lens,
                config, positions, fresh_prefill=fresh_prefill,
                tables=tables, use_kernels=use_kernels,
            )
        x = x + attn_out
        h = rms_norm(x, layer["post_attention_layernorm"], config.rms_norm_eps)
        x = x + _mlp(layer, h, config, use_kernels)

    x = rms_norm(x, params["norm"], config.rms_norm_eps)
    if last_logit_only:
        x = x[:, -1:, :]

    lm_head = params["lm_head"]
    if isinstance(lm_head, QuantizedTensor):
        logits = quantized_matmul(x, lm_head, use_kernels)
    else:
        logits = jax.lax.dot_general(
            x, lm_head,
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if tables is not None:
        kv_cache = PagedKVCache(k=kv_k_all, v=kv_v_all, tables=tables,
                                lengths=cache_lens + S)
    else:
        kv_cache = KVCache(k=kv_k_all, v=kv_v_all, lengths=cache_lens + S)
    return logits, kv_cache


# --------------------------------------------------------------------------- #
# parameter loading

def load_llama_params(
    path: str,
    run_compressed: bool = True,
    dtype=jnp.bfloat16,
    device_put=None,
    use_kernels: Optional[bool] = None,
) -> tuple[dict, LlamaConfig, Any]:
    """Load a compressed-tensors Llama checkpoint into a params pytree.

    :param run_compressed: keep weights compressed (the TPU default)
    :param device_put: optional callable(tensor, module_name, param_name)
        placing arrays (used for sharded multi-chip loading)
    :param use_kernels: build fused-kernel weight layouts at load time
        (default: on when running on TPU / interpret mode)
    :return: (params, config, model_compressor)
    """
    from compressed_tensors_tpu.ops.linear import (
        _kernel_enabled,
        prepare_for_kernels,
    )

    if use_kernels is None:
        use_kernels = _kernel_enabled()
    use_kernels = use_kernels and run_compressed
    from compressed_tensors_tpu.compressors import (
        ModelCompressor,
        module_graph_from_names,
    )
    from compressed_tensors_tpu.utils.safetensors_io import CheckpointReader

    config = LlamaConfig.from_pretrained(path)
    mc = ModelCompressor.from_pretrained(path)

    reader = CheckpointReader(path)
    module_names = reader.module_names()
    modules = module_graph_from_names(module_names)
    schemes = mc.resolve_schemes(modules) if mc is not None else {}

    def _put(arr, mod, name):
        a = jnp.asarray(np.asarray(arr))
        if device_put is not None:
            a = device_put(a, mod, name)
        return a

    def _get_qt(mod_name: str, kernels: bool | None = None,
                perm_out=None) -> QuantizedTensor:
        state = {
            k: _put(v, mod_name, k)
            for k, v in reader.module_state_dict(mod_name).items()
        }
        scheme = schemes.get(mod_name)
        if not run_compressed and mc is not None:
            state = mc.decompress_state({mod_name: state}, modules)[mod_name]
        qt = from_compressed_state(state, scheme)
        # cast float weights to engine dtype
        if qt.weight is not None and np.dtype(qt.weight.dtype).kind == "f" and \
                not str(qt.weight.dtype).startswith("float8"):
            qt = dataclasses.replace(qt, weight=qt.weight.astype(dtype))
        if perm_out is not None:
            from compressed_tensors_tpu.ops.linear import permute_output_rows

            qt = permute_output_rows(qt, perm_out)
        if kernels if kernels is not None else use_kernels:
            qt = prepare_for_kernels(qt)
        return qt

    params: dict = {"layers": []}
    embed_qt = _get_qt("model.embed_tokens")
    params["embed_tokens"] = materialize_weight(embed_qt, dtype=dtype)

    from compressed_tensors_tpu.ops.linear import stack_quantized_tensors

    def _load_moe(prefix: str) -> dict | None:
        """Stacked-expert MoE block. Recognizes Qwen/DeepSeek naming
        (`mlp.experts.N.{gate,up,down}_proj` + `mlp.gate` router, optional
        `mlp.shared_expert[s]`) and Mixtral naming
        (`block_sparse_moe.experts.N.{w1,w3,w2}` + `block_sparse_moe.gate`).
        """
        styles = [
            (f"{prefix}.mlp", "experts", ("gate_proj", "up_proj", "down_proj"),
             ("gate_proj", "up_proj", "down_proj")),
            (f"{prefix}.block_sparse_moe", "experts", ("w1", "w3", "w2"),
             ("gate_proj", "up_proj", "down_proj")),
        ]
        for base, exp, src_names, dst_names in styles:
            if f"{base}.{exp}.0.{src_names[0]}" not in module_names:
                continue
            E = config.num_local_experts or sum(
                1 for m in module_names
                if m.startswith(f"{base}.{exp}.")
                and m.endswith(f".{src_names[0]}")
            )
            # experts stack in checkpoint layout, then WnA16 formats get
            # stacked fused-kernel layouts (vmapped over the expert dim);
            # w8a8 formats keep the 3D leaves for the native batched
            # int8/fp8 MXU path
            from compressed_tensors_tpu.ops.linear import (
                prepare_experts_for_kernels,
            )

            def _stack_experts(src):
                st = stack_quantized_tensors([
                    _get_qt(f"{base}.{exp}.{j}.{src}", kernels=False)
                    for j in range(E)
                ])
                return (prepare_experts_for_kernels(st)
                        if use_kernels else st)

            experts = {
                dst: _stack_experts(src)
                for src, dst in zip(src_names, dst_names)
            }
            router_state = reader.module_state_dict(f"{base}.gate")
            moe: dict = {
                "router": _put(router_state["weight"], base, "gate").astype(
                    dtype
                ),
                "experts": experts,
            }
            for shared in ("shared_expert", "shared_experts"):
                if f"{base}.{shared}.gate_proj" in module_names:
                    moe["shared_expert"] = {
                        p: _get_qt(f"{base}.{shared}.{p}")
                        for p in ("gate_proj", "up_proj", "down_proj")
                    }
                    break
            return moe
        return None

    for i in range(config.num_hidden_layers):
        prefix = f"model.layers.{i}"
        layer: dict = {}
        if config.is_mla:
            # DeepSeek MLA projections (+ latent layernorms).
            # Interleaved-rope checkpoints (DeepSeek V2/V3) are converted to
            # the engine's half-rotation layout here by permuting the
            # rope-dim output rows of kv_a_proj_with_mqa and the q
            # projection: rot_half(P x) == P rot_interleaved(x), so the
            # q.k dots match the training convention exactly (see
            # LlamaConfig.rope_interleaved).
            rope_d = config.qk_rope_head_dim
            if config.rope_interleaved:
                il2half = np.concatenate([
                    np.arange(0, rope_d, 2), np.arange(1, rope_d, 2)
                ])
                r = config.kv_lora_rank
                kv_a_perm = np.concatenate([np.arange(r), r + il2half])
                qk_d = config.qk_nope_head_dim + rope_d
                q_perm = np.concatenate([
                    h0 * qk_d + np.concatenate(
                        [np.arange(config.qk_nope_head_dim),
                         config.qk_nope_head_dim + il2half])
                    for h0 in range(config.num_attention_heads)
                ])
            else:
                kv_a_perm = q_perm = None
            mla_perms = {"kv_a_proj_with_mqa": kv_a_perm,
                         "q_proj": q_perm, "q_b_proj": q_perm}
            mla_projs = ["kv_a_proj_with_mqa", "kv_b_proj", "o_proj"]
            if f"{prefix}.self_attn.q_a_proj" in module_names:
                mla_projs += ["q_a_proj", "q_b_proj"]
                layer["q_a_layernorm"] = _put(
                    reader.get(f"{prefix}.self_attn.q_a_layernorm.weight"),
                    prefix, "ln").astype(dtype)
            else:
                mla_projs.append("q_proj")
            for proj in mla_projs:
                # kv_b_proj is consumed as a dense matrix (absorbed into
                # the query / latent expansion), never via a matmul kernel:
                # keep its checkpoint layout for materialize_weight
                layer[proj] = _get_qt(f"{prefix}.self_attn.{proj}",
                                      kernels=(proj != "kv_b_proj"),
                                      perm_out=mla_perms.get(proj))
            layer["kv_a_layernorm"] = _put(
                reader.get(f"{prefix}.self_attn.kv_a_layernorm.weight"),
                prefix, "ln").astype(dtype)
        else:
            for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                layer[proj] = _get_qt(f"{prefix}.self_attn.{proj}")
        moe = _load_moe(prefix)
        if moe is not None:
            layer["moe"] = moe
        else:
            for proj in ("gate_proj", "up_proj", "down_proj"):
                layer[proj] = _get_qt(f"{prefix}.mlp.{proj}")
        # norms are plain tensors (module_state_dict returns {"weight": ...})
        layer["input_layernorm"] = _put(
            reader.get(f"{prefix}.input_layernorm.weight"), prefix, "ln"
        ).astype(dtype)
        layer["post_attention_layernorm"] = _put(
            reader.get(f"{prefix}.post_attention_layernorm.weight"), prefix,
            "ln",
        ).astype(dtype)
        # KV-cache scales if serialized (k_scale/v_scale on attention module)
        attn_state = reader.module_state_dict(f"{prefix}.self_attn")
        for sname in ("k_scale", "v_scale", "q_scale"):
            if sname in attn_state:
                layer[sname] = _put(attn_state[sname], prefix, sname)
        # Qwen3-style per-head q/k norms
        for nname in ("q_norm", "k_norm"):
            full = f"{prefix}.self_attn.{nname}.weight"
            if full in reader.tensor_names():
                layer[nname] = _put(reader.get(full), prefix, nname).astype(
                    dtype
                )
        params["layers"].append(layer)

    params["norm"] = _put(reader.get("model.norm.weight"), "model.norm",
                          "weight").astype(dtype)

    if "lm_head" in module_names:
        params["lm_head"] = _get_qt("lm_head")
    else:
        # tied embeddings: logits = x @ embed^T, same (V, H) layout
        params["lm_head"] = params["embed_tokens"]

    reader.close()
    return params, config, mc
