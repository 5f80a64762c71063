"""Fused causal flash-attention Pallas kernel for prefill (S > 1).

Replaces the jnp prefill path's materialized (B, KVH, rep, S, S) f32 score
tensor with an online-softmax streaming kernel: scores never leave VMEM, so
prefill attention HBM traffic drops from O(S^2) to O(S·D) — the difference
between bandwidth-bound and compute-bound prefill at long prompt lengths.

TPU mapping (r4 restructure — the r3 kernel ran one program per
(batch, q-head, q-tile) and was grid/latency-bound at ~1-8% of its score
floor):
- grid (B, KVH, S/Tq): one program per *kv-head group* per query tile. All
  `rep` GQA query heads of the group fold into the program's row dimension,
  so the score dot is one (rep·Tq, Tk) MXU op instead of `rep` separate
  (Tq, Tk) programs — 8x fewer programs and 8x bigger dots for a 32q/4kv
  model, and repeated KV heads are never materialized.
- K/V for one (batch, kv-head) live in VMEM whole (S_pad·Dp·2B each —
  ~0.5MB at S=2048, D=128 bf16), fetched once per (b, kvh) by block
  revisiting; sliced per k-tile with `pl.ds`. The causal upper bound on the
  inner `fori_loop` skips future tiles entirely.
- Online softmax carries (acc f32 (rep·Tq, Dp), m, l) ride the loop; the
  p·V dot runs in the value dtype on the MXU with f32 accumulation.

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


def _make_kernel(s: int, tq: int, tk: int, rep: int, d: int, out_dtype):
    rows = rep * tq

    def kernel(q_ref, k_ref, v_ref, o_ref):
        i = pl.program_id(2)
        # (rep, Tq, Dp) -> (rep*Tq, Dp); q is pre-scaled by 1/sqrt(d)
        q = q_ref[0, 0].reshape(rows, d).astype(jnp.float32)
        # row r of the folded tile is query position i*Tq + (r % Tq)
        q_pos = i * tq + jax.lax.broadcasted_iota(
            jnp.int32, (rep, tq, tk), 1
        ).reshape(rows, tk)

        acc0 = jnp.zeros((rows, d), dtype=jnp.float32)
        m0 = jnp.full((rows, 1), -1e30, dtype=jnp.float32)
        l0 = jnp.zeros((rows, 1), dtype=jnp.float32)

        LOG2E = 1.4426950408889634

        def tile(j, carry, masked: bool):
            acc, m, l = carry
            start = pl.multiple_of(j * tk, tk)
            kj = k_ref[0, 0, pl.ds(start, tk)].astype(jnp.float32)  # (Tk, Dp)
            vj = v_ref[0, 0, pl.ds(start, tk)]                      # (Tk, Dp)
            s_ij = jax.lax.dot_general(
                q, kj, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (rows, Tk)
            if masked:
                k_pos = j * tk + jax.lax.broadcasted_iota(
                    jnp.int32, (rows, tk), 1
                )
                mask = (k_pos <= q_pos) & (k_pos < s)
                s_ij = jnp.where(mask, s_ij, -1e30)

            # exp2 instead of exp: the softmax transcendental dominates the
            # whole kernel's VPU time (S^2 exps/layer); pow2 lowers cheaper
            m_new = jnp.maximum(m, jnp.max(s_ij, axis=-1, keepdims=True))
            p = jnp.exp2((s_ij - m_new) * LOG2E)
            if masked:
                p = jnp.where(mask, p, 0.0)
            alpha = jnp.exp2((m - m_new) * LOG2E)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(vj.dtype), vj,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc * alpha + pv
            return acc, m_new, l

        # causal split: every k-tile strictly below the q-tile's first row
        # is fully visible (masked only by the s bound) — skip the causal
        # mask/where work there; only the tile(s) crossing the diagonal and
        # the sequence tail pay the masked path
        full_end = jnp.minimum((i * tq) // tk, s // tk)
        n_blocks = ((i + 1) * tq + tk - 1) // tk
        carry = jax.lax.fori_loop(
            0, full_end, lambda j, c: tile(j, c, masked=False),
            (acc0, m0, l0))
        acc, m, l = jax.lax.fori_loop(
            full_end, n_blocks, lambda j, c: tile(j, c, masked=True), carry)
        out = jnp.where(l > 0, acc / l, 0.0)
        o_ref[0, 0] = out.reshape(rep, tq, d).astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rep", "s", "tq", "tk", "out_dtype")
)
def _prefill_call(q, k, v, *, rep, s, tq, tk, out_dtype):
    B, KVH, _rep, S_pad, Dp = q.shape

    kernel = _make_kernel(s, tq, tk, rep, Dp, out_dtype)
    grid = (B, KVH, S_pad // tq)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, rep, tq, Dp),
                         lambda b, h, i: (b, h, 0, i, 0)),
            pl.BlockSpec((1, 1, S_pad, Dp), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S_pad, Dp), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, tq, Dp),
                               lambda b, h, i: (b, h, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, KVH, rep, S_pad, Dp), out_dtype),
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
    tq = 128
    tk = 256 if S > 256 else 128
    S_pad = int(np.ceil(S / max(tq, tk)) * max(tq, tk))

    def pad_kv(x):
        x = jnp.pad(x, ((0, 0), (0, S_pad - S), (0, 0), (0, Dp - D)))
        return x.transpose(0, 2, 1, 3)  # (B, KVH, S_pad, Dp)

    # queries: (B, S, H, D) -> (B, KVH, rep, S_pad, Dp)
    qs = (q * jnp.asarray(sm_scale, q.dtype)).reshape(B, S, KVH, rep, D)
    qs = jnp.pad(qs, ((0, 0), (0, S_pad - S), (0, 0), (0, 0), (0, Dp - D)))
    qh = qs.transpose(0, 2, 3, 1, 4)

    out = _prefill_call(qh, pad_kv(k), pad_kv(v), rep=rep, s=S, tq=tq,
                        tk=tk, out_dtype=q.dtype)
    # (B, KVH, rep, S_pad, Dp) -> (B, S, H, D)
    out = out.transpose(0, 3, 1, 2, 4).reshape(B, S_pad, H, Dp)
    return out[:, :S, :, :D]
