"""Fused causal flash-attention Pallas kernel for prefill (S > 1).

Replaces the jnp prefill path's materialized (B, KVH, rep, S, S) f32 score
tensor with an online-softmax streaming kernel: scores never leave VMEM, so
prefill attention HBM traffic drops from O(S^2) to O(S·D) — the difference
between bandwidth-bound and compute-bound prefill at long prompt lengths.

TPU mapping:
- grid (B, H, S/Tq): one program per query tile per head; the kv-head block
  for GQA is selected by index_map (h // rep) so repeated KV heads are
  never materialized.
- K/V for one (batch, kv-head) live in VMEM whole (S_pad·Dp·2B each — ~0.5MB
  at S=2048, D=128 bf16) and are sliced per k-tile with `pl.ds`; the causal
  upper bound on the inner `fori_loop` skips future tiles entirely (~2x over
  masking them).
- Online softmax carries (acc f32 (Tq, Dp), m, l) ride the loop; the p·V
  dot runs in the value dtype on the MXU with f32 accumulation.

The reference delegates attention entirely to transformers/vLLM (SURVEY.md
§2.7-2.8); this is engine-side capability. Post-RoPE q/k semantics match the
reference's hook placement (ref modeling/attention.py:65).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["prefill_attention"]


def _interpret() -> bool:
    # load-time-resolved flag (never an env read at trace time)
    from compressed_tensors_tpu.flags import FLAGS

    if FLAGS.pallas_interpret:
        return True
    return jax.default_backend() not in ("tpu",)


def _make_kernel(s: int, s_pad: int, tq: int, tk: int, d: int,
                 inv_sqrt_d: float, out_dtype):
    nkq = tq // tk if tq >= tk else 1

    def kernel(q_ref, k_ref, v_ref, o_ref):
        i = pl.program_id(2)
        q = q_ref[0, 0].astype(jnp.float32) * inv_sqrt_d  # (Tq, Dp)
        q_pos = i * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)

        acc0 = jnp.zeros((tq, d), dtype=jnp.float32)
        m0 = jnp.full((tq, 1), -1e30, dtype=jnp.float32)
        l0 = jnp.zeros((tq, 1), dtype=jnp.float32)

        def body(j, carry):
            acc, m, l = carry
            start = pl.multiple_of(j * tk, tk)
            kj = k_ref[0, 0, pl.ds(start, tk)].astype(jnp.float32)  # (Tk, Dp)
            vj = v_ref[0, 0, pl.ds(start, tk)]                      # (Tk, Dp)
            s_ij = jax.lax.dot_general(
                q, kj, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Tq, Tk)
            k_pos = j * tk + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
            mask = (k_pos <= q_pos) & (k_pos < s)
            s_ij = jnp.where(mask, s_ij, -1e30)

            m_new = jnp.maximum(m, jnp.max(s_ij, axis=-1, keepdims=True))
            p = jnp.where(mask, jnp.exp(s_ij - m_new), 0.0)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(vj.dtype), vj,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc * alpha + pv
            return acc, m_new, l

        # causal: only k-tiles that intersect [0, (i+1)*Tq) are live
        n_blocks = (i + 1) * nkq if tq >= tk else (i // (tk // tq)) + 1
        acc, m, l = jax.lax.fori_loop(0, n_blocks, body, (acc0, m0, l0))
        out = jnp.where(l > 0, acc / l, 0.0)
        o_ref[0, 0] = out.astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rep", "s", "tq", "tk", "out_dtype")
)
def _prefill_call(q, k, v, *, rep, s, tq, tk, out_dtype):
    B, H, S_pad, Dp = q.shape
    KVH = k.shape[1]
    inv_sqrt_d = 1.0  # scale folded by caller

    kernel = _make_kernel(s, S_pad, tq, tk, Dp,
                          inv_sqrt_d, out_dtype)
    grid = (B, H, S_pad // tq)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tq, Dp), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, S_pad, Dp),
                         lambda b, h, i, _rep=rep: (b, h // _rep, 0, 0)),
            pl.BlockSpec((1, 1, S_pad, Dp),
                         lambda b, h, i, _rep=rep: (b, h // _rep, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tq, Dp), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, S_pad, Dp), out_dtype),
        interpret=_interpret(),
    )(q, k, v)


def prefill_attention(
    q: jnp.ndarray,  # (B, S, H, D) post-RoPE
    k: jnp.ndarray,  # (B, S, KVH, D) post-RoPE
    v: jnp.ndarray,  # (B, S, KVH, D)
    *,
    sm_scale: float | None = None,
) -> jnp.ndarray:
    """Causal GQA flash attention over the prompt tokens.

    Returns (B, S, H, D) in q's dtype. Handles lane-padding of D and
    tile-padding of S internally.
    """
    B, S, H, D = q.shape
    KVH = k.shape[2]
    rep = H // KVH
    sm_scale = sm_scale if sm_scale is not None else 1.0 / float(np.sqrt(D))

    Dp = max(128, int(np.ceil(D / 128) * 128))
    tq = tk = 128 if S <= 1024 else 256
    S_pad = int(np.ceil(S / tq) * tq)

    def pad_heads(x, n_heads):
        x = jnp.pad(x, ((0, 0), (0, S_pad - S), (0, 0), (0, Dp - D)))
        return x.transpose(0, 2, 1, 3)  # (B, heads, S_pad, Dp)

    qh = pad_heads(q * jnp.asarray(sm_scale, q.dtype), H)
    kh = pad_heads(k, KVH)
    vh = pad_heads(v, KVH)

    out = _prefill_call(qh, kh, vh, rep=rep, s=S, tq=tq, tk=tk,
                        out_dtype=q.dtype)
    return out.transpose(0, 2, 1, 3)[:, :S, :, :D]
