"""DeepSeek V2/V3 multi-head latent attention (MLA), run-compressed.

The KV cache stores only the latent state per token — c_kv (kv_lora_rank)
and the shared rope key k_pe (qk_rope_head_dim) — instead of per-head K/V:
for DeepSeek V3 that is 576 floats/token/layer vs 32k+ for naive MHA
caching, which is the feature's whole point.

Decode uses the **absorbed-matmul** form: the k-side of kv_b_proj is folded
into the query (q_c = q_nope @ W_kb per head), turning MLA into MQA with a
single latent "head" of dim kv_lora_rank + qk_rope_head_dim — which the
existing fused decode kernels (decode_attention / flash_decode /
paged_decode) execute unmodified with kvh=1:

    scores_h = [q_c_h ; q_pe_h] . [c_kv ; k_pe]      (one concat dot)
    out_h    = softmax(scores) @ c_kv                (latent values)
    attn_h   = out_h @ W_vb_h                        (un-absorb v)

Prefill runs the standard non-absorbed form (expand cached latents through
kv_b_proj, plain causal MHA) and writes latents into the cache, so decode
reads exactly what prefill wrote.

RoPE on the rope dims uses this engine's half-rotation convention
(models/llama.py:_rope); absorbed and non-absorbed paths share it, so they
agree with each other. The reference library has no model definitions —
its DeepSeek surface is the FP8-block converter (ref
entrypoints/convert/converters/fp8block_dequantizer.py) and the
DeepSeek-V3 kv-cache quant test (ref tests/test_modeling/
test_deepseekv3_kvcache_quant.py); the k_scale/v_scale parameters it
serializes apply here to the latent cache.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from compressed_tensors_tpu.models.config import LlamaConfig
from compressed_tensors_tpu.ops.linear import (
    materialize_weight,
    quantized_matmul,
)

__all__ = ["mla_attention"]


def _rms(x, w, eps):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(
        dtype
    )


def _rope_rotate(x, cos, sin):
    # x: (B, S, Hh, rope_d); cos/sin: (B, S, rope_d/2)
    d = x.shape[-1] // 2
    x1, x2 = x[..., :d], x[..., d:]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _kv_b_weight(layer, dtype):
    """kv_b_proj weight as a dense (h*(nope+vd), r) matrix (absorption needs
    the raw matrix, not a matmul)."""
    return materialize_weight(layer["kv_b_proj"], dtype=dtype)


def mla_attention(
    layer: dict,
    layer_idx: int,
    x: jnp.ndarray,           # (B, S, H) normed hidden states
    cos: jnp.ndarray,         # (B, S, rope_d/2) rope tables for positions
    sin: jnp.ndarray,
    kv_k_all: jnp.ndarray,    # (L, B, 1, S_pad, Dp_k): rows [c_kv ; k_pe]
    kv_v_all: jnp.ndarray,    # (L, B, 1, S_pad, Dp_k): rows [c_kv ; 0]
    cache_lens: jnp.ndarray,  # (B,)
    config: LlamaConfig,
    positions: jnp.ndarray,   # (B, S)
    use_kernels: bool = True,  # static: fused Pallas kernel paths
    tables: jnp.ndarray | None = None,  # (B, P) page tables (paged cache)
):
    """Returns (o_proj output, kv_k_all, kv_v_all). With `tables` the
    latent cache is a page pool (L, NP, 1, page, Dp): decode rides the
    paged flash kernel with a single latent head; prefill gathers the
    rows' pages into a contiguous view, runs the dense logic, and
    scatters back (mirroring llama._attention's paged paths)."""
    B, S, _ = x.shape
    h = config.num_attention_heads
    nope = config.qk_nope_head_dim
    rope_d = config.qk_rope_head_dim
    r = config.kv_lora_rank
    vd = config.v_head_dim
    qk_d = nope + rope_d
    Dp = kv_k_all.shape[-1]

    # ---- projections --------------------------------------------------- #
    if "q_a_proj" in layer:
        qa = quantized_matmul(x, layer["q_a_proj"], use_kernels)
        qa = _rms(qa, layer["q_a_layernorm"], config.rms_norm_eps)
        q = quantized_matmul(qa, layer["q_b_proj"], use_kernels)
    else:
        q = quantized_matmul(x, layer["q_proj"], use_kernels)
    q = q.reshape(B, S, h, qk_d)
    q_nope, q_pe = q[..., :nope], q[..., nope:]

    kv_a = quantized_matmul(x, layer["kv_a_proj_with_mqa"],
                            use_kernels)                     # (B,S,r+rope)
    c_kv = _rms(kv_a[..., :r], layer["kv_a_layernorm"], config.rms_norm_eps)
    k_pe = kv_a[..., r:]                                     # (B, S, rope_d)

    q_pe = _rope_rotate(q_pe, cos, sin)
    k_pe = _rope_rotate(k_pe[:, :, None, :], cos, sin)[:, :, 0]
    # reassemble q with the *rotated* rope dims — the eager scores path
    # consumes full q, and must see the same post-RoPE query the absorbed
    # path builds from q_nope/q_pe
    q = jnp.concatenate([q_nope, q_pe], axis=-1)

    # latent cache rows
    lat_k = jnp.concatenate([c_kv, k_pe], axis=-1)           # (B,S,r+rope)
    lat_v = c_kv                                             # (B, S, r)

    inv_sqrt = 1.0 / jnp.sqrt(jnp.float32(qk_d))
    w_kvb = _kv_b_weight(layer, x.dtype).reshape(h, nope + vd, r)
    w_kb = w_kvb[:, :nope, :]   # (h, nope, r)
    w_vb = w_kvb[:, nope:, :]   # (h, vd, r)

    k_scale = layer.get("k_scale")
    v_scale = layer.get("v_scale")

    if S == 1 and use_kernels and (k_scale is None) == (v_scale is None):
        # ---- absorbed decode: MQA over the latent head ------------------ #
        q_c = jnp.einsum("bhd,hdr->bhr", q_nope[:, 0], w_kb)  # (B, h, r)
        q_cat = jnp.concatenate([q_c, q_pe[:, 0]], axis=-1)   # (B,h,r+rope)
        pad = Dp - (r + rope_d)
        q_cat = jnp.pad(q_cat, ((0, 0), (0, 0), (0, pad)))
        new_k = jnp.pad(lat_k[:, 0][:, None, :],
                        ((0, 0), (0, 0), (0, pad)))
        new_v = jnp.pad(lat_v[:, 0][:, None, :],
                        ((0, 0), (0, 0), (0, Dp - r)))
        if tables is not None:
            from compressed_tensors_tpu.ops.kernels.paged_decode import (
                paged_decode_attention,
            )

            out, kv_k_all, kv_v_all = paged_decode_attention(
                q_cat, new_k, new_v, kv_k_all, kv_v_all, tables,
                cache_lens, kvh=1, rep=h, d=Dp, true_d=qk_d,
                k_scale=k_scale, v_scale=v_scale, layer=layer_idx,
            )
        else:
            from compressed_tensors_tpu.ops.kernels.decode_attention import (
                decode_attention,
            )

            out, kv_k_all, kv_v_all = decode_attention(
                q_cat, new_k, new_v, kv_k_all, kv_v_all, cache_lens,
                kvh=1, rep=h, d=Dp, true_d=qk_d,
                k_scale=k_scale, v_scale=v_scale, layer=layer_idx,
            )
        out_r = out[..., :r].astype(x.dtype)                  # (B, h, r)
        attn = jnp.einsum("bhr,hvr->bhv", out_r, w_vb)        # (B, h, vd)
        attn = attn.reshape(B, 1, h * vd).astype(x.dtype)
        return (quantized_matmul(attn, layer["o_proj"], use_kernels),
                kv_k_all, kv_v_all)

    # ---- non-absorbed prefill / eager path ------------------------------ #
    if tables is not None:
        # gather the rows' pages into a contiguous (B, 1, P*page, Dp) view,
        # recurse on the dense logic, and scatter the pages back (the
        # prefill-only gather/scatter mirror of llama._attention's paged
        # path; duplicate table ids only ever reference the null page 0)
        NPt = tables.shape[1]
        page = kv_k_all.shape[3]
        gk = jnp.take(kv_k_all[layer_idx], tables, axis=0)
        gv = jnp.take(kv_v_all[layer_idx], tables, axis=0)
        dense_k = gk.transpose(0, 2, 1, 3, 4).reshape(
            1, B, 1, NPt * page, Dp)
        dense_v = gv.transpose(0, 2, 1, 3, 4).reshape(
            1, B, 1, NPt * page, Dp)
        out, nk, nv = mla_attention(
            layer, 0, x, cos, sin, dense_k, dense_v, cache_lens, config,
            positions, use_kernels=use_kernels, tables=None,
        )
        nk_pages = nk[0].reshape(B, 1, NPt, page, Dp).transpose(
            0, 2, 1, 3, 4)
        nv_pages = nv[0].reshape(B, 1, NPt, page, Dp).transpose(
            0, 2, 1, 3, 4)
        flat_idx = tables.reshape(-1)
        pool_k = kv_k_all[layer_idx].at[flat_idx].set(
            nk_pages.reshape(B * NPt, 1, page, Dp))
        pool_v = kv_v_all[layer_idx].at[flat_idx].set(
            nv_pages.reshape(B * NPt, 1, page, Dp))
        kv_k_all = jax.lax.dynamic_update_index_in_dim(kv_k_all, pool_k,
                                                       layer_idx, 0)
        kv_v_all = jax.lax.dynamic_update_index_in_dim(kv_v_all, pool_v,
                                                       layer_idx, 0)
        return out, kv_k_all, kv_v_all

    # write latents at [len_b, len_b+S) (negative length = inactive row)
    lat_k_c = jnp.pad(lat_k, ((0, 0), (0, 0), (0, Dp - (r + rope_d))))
    lat_v_c = jnp.pad(lat_v, ((0, 0), (0, 0), (0, Dp - r)))
    if k_scale is not None:
        s = k_scale.reshape(()).astype(jnp.float32)
        lat_k_c = (lat_k_c.astype(jnp.float32) / s)
    if v_scale is not None:
        s = v_scale.reshape(()).astype(jnp.float32)
        lat_v_c = (lat_v_c.astype(jnp.float32) / s)
    cache_dtype = kv_k_all.dtype
    if str(cache_dtype).startswith("int8"):
        lat_k_c = jnp.clip(jnp.round(lat_k_c), -128, 127)
        lat_v_c = jnp.clip(jnp.round(lat_v_c), -128, 127)
    lat_k_c = lat_k_c.astype(cache_dtype)[:, None]  # (B, 1, S, Dp)
    lat_v_c = lat_v_c.astype(cache_dtype)[:, None]

    def _write_row(cache_b, new_b, off):
        upd = jax.lax.dynamic_update_slice(
            cache_b, new_b, (0, jnp.maximum(off, 0), 0)
        )
        return jnp.where(off >= 0, upd, cache_b)

    kv_k = jax.vmap(_write_row)(kv_k_all[layer_idx], lat_k_c, cache_lens)
    kv_v = jax.vmap(_write_row)(kv_v_all[layer_idx], lat_v_c, cache_lens)
    kv_k_all = jax.lax.dynamic_update_index_in_dim(kv_k_all, kv_k,
                                                   layer_idx, 0)
    kv_v_all = jax.lax.dynamic_update_index_in_dim(kv_v_all, kv_v,
                                                   layer_idx, 0)

    # read back the cached latents (QDQ'd, so prefill attends over exactly
    # what decode will read) and expand through kv_b
    lat = kv_k[:, 0].astype(jnp.float32)  # (B, T, Dp)
    if k_scale is not None:
        lat = lat * k_scale.reshape(()).astype(jnp.float32)
    lat = lat.astype(x.dtype)
    c_all = lat[..., :r]                  # (B, T, r)
    kpe_all = lat[..., r:r + rope_d]      # (B, T, rope_d)
    T = c_all.shape[1]

    k_nope_all = jnp.einsum("btr,hdr->bthd", c_all, w_kb)  # (B,T,h,nope)
    v_all = jnp.einsum("btr,hvr->bthv", c_all, w_vb)       # (B,T,h,vd)
    k_all = jnp.concatenate(
        [k_nope_all,
         jnp.broadcast_to(kpe_all[:, :, None, :], (B, T, h, rope_d))],
        axis=-1,
    )  # (B, T, h, qk_d)

    scores = jnp.einsum("bshd,bthd->bhst", q, k_all,
                        preferred_element_type=jnp.float32) * inv_sqrt
    q_pos = positions[:, None, :, None]            # (B, 1, S, 1)
    k_pos = jnp.arange(T)[None, None, None, :]
    valid = (cache_lens[:, None, None, None] + S)
    mask = (k_pos <= q_pos) & (k_pos < valid)
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhst,bthv->bshv", probs, v_all,
                      preferred_element_type=jnp.float32).astype(x.dtype)
    attn = attn.reshape(B, S, h * vd)
    return (quantized_matmul(attn, layer["o_proj"], use_kernels),
            kv_k_all, kv_v_all)
