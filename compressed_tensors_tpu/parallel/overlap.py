"""Collective-overlapped tensor-parallel matmuls (shard_map + ppermute).

GSPMD's automatic sharding inserts one all-gather/reduce-scatter around
each TP matmul and already overlaps it with neighboring ops where its
scheduler can; these hand-scheduled ring variants force the overlap at
the op level — each ring step's collective permute moves the NEXT chunk
while the MXU consumes the current one. This is the idiomatic TPU
replacement for the reference's NCCL send/recv patterns (SURVEY §2.10 /
§7 step 7: "collective-overlapped TP matmuls"): `jax.lax.ppermute` over
the ICI ring, compiled by XLA so DMA and compute pipeline per step.

Use inside `jax.shard_map` over a mesh with a `tp` axis. Validated
token-for-token against the GSPMD path on the virtual device mesh
(tests/test_parallel/test_overlap.py); perf characterization needs real
multi-chip ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ring_allgather_matmul", "matmul_reducescatter",
           "ring_allgather_matmul_fn", "ring_allgather_matmul_quantized"]


def ring_allgather_matmul(x_shard, w_local, axis_name: str = "tp"):
    """y_local = allgather(x, tp) @ w_local^T without materializing the
    gathered activations: x shards rotate around the ring while each
    device multiplies the chunk it currently holds against the matching
    K-slice of its weight shard.

    Per-device operands (inside shard_map):
      x_shard: (B, K/tp)   — activations sharded on the feature dim
      w_local: (N/tp, K)   — weights sharded on the output dim, full K
    Returns (B, N/tp): the output shard of the same tp rank.

    Ring step i: every device holds the x shard of rank (r - i) mod tp,
    multiplies it against its weight columns for that K-range, and
    ppermutes the shard to rank r+1 — the permute of step i+1's operand
    overlaps step i's dot under XLA's async collective scheduling.
    """
    tp = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    b, k_shard = x_shard.shape
    n_local = w_local.shape[0]
    perm = [(i, (i + 1) % tp) for i in range(tp)]

    w_slices = w_local.reshape(n_local, tp, k_shard)

    def step(i, carry):
        chunk, acc = carry
        # the K-range this chunk covers: owner rank (rank - i) mod tp
        src = (rank - i) % tp
        w_i = jnp.take(w_slices, src, axis=1)  # (N/tp, K/tp)
        acc = acc + jax.lax.dot_general(
            chunk, w_i,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # rotate for the next step (skipped result on the last iteration)
        chunk = jax.lax.ppermute(chunk, axis_name, perm)
        return chunk, acc

    acc0 = jnp.zeros((b, n_local), jnp.float32)
    _, acc = jax.lax.fori_loop(0, tp, step, (x_shard, acc0))
    return acc.astype(x_shard.dtype)


def matmul_reducescatter(x_full, w_kshard, axis_name: str = "tp"):
    """y_shard = reduce_scatter(x @ w^T) with the partial-sum exchange
    overlapped against the chunked matmul.

    Per-device operands (inside shard_map):
      x_full:   (B, K/tp)  — activations sharded on the contraction dim
      w_kshard: (N, K/tp)  — weights sharded on the contraction dim
    Returns (B, N/tp): rank r's shard of the psum'd output.

    Each ring step computes the partial for ONE output shard and adds it
    to the accumulator arriving from the previous rank; after tp steps
    every accumulator has visited every device, landing on its owner
    with the full sum (the classic reduce-scatter ring, compute fused in).
    """
    tp = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    b = x_full.shape[0]
    n = w_kshard.shape[0]
    n_shard = n // tp
    perm = [(i, (i + 1) % tp) for i in range(tp)]

    w_out = w_kshard.reshape(tp, n_shard, -1)

    def step(i, acc):
        # the accumulator at this device at step i has hopped i times
        # (it started at rank - i) and will hop tp-1-i more, landing at
        # rank + tp-1-i — that landing rank is the output shard it owns
        dst = (rank - 1 - i) % tp
        w_i = jnp.take(w_out, dst, axis=0)  # (N/tp, K/tp)
        partial = jax.lax.dot_general(
            x_full, w_i,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + partial
        if_last = i == tp - 1
        acc = jax.lax.cond(
            if_last, lambda a: a,
            lambda a: jax.lax.ppermute(a, axis_name, perm), acc)
        return acc

    acc = jnp.zeros((b, n_shard), jnp.float32)
    acc = jax.lax.fori_loop(0, tp, step, acc)
    return acc.astype(x_full.dtype)


def ring_allgather_matmul_fn(x_shard, chunk_matmuls, axis_name: str = "tp"):
    """Generalized ring: `chunk_matmuls[src](x_chunk) -> (B, N_local)`
    computes the partial for the x shard owned by rank `src`. Lets the
    chunk dot be a fused dequant-GEMM kernel — the north star's
    "collectives overlap the dequant-GEMM compute" — while the ppermute
    moves the next chunk."""
    tp = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % tp) for i in range(tp)]

    def step(i, carry):
        chunk, acc = carry
        src = (rank - i) % tp
        acc = acc + jax.lax.switch(src, chunk_matmuls, chunk)
        chunk = jax.lax.ppermute(chunk, axis_name, perm)
        return chunk, acc

    probe = jax.eval_shape(chunk_matmuls[0], x_shard)
    acc0 = jnp.zeros(probe.shape, jnp.float32)
    _, acc = jax.lax.fori_loop(0, tp, step, (x_shard, acc0))
    return acc.astype(x_shard.dtype)


def ring_allgather_matmul_quantized(x_shard, qt, tp: int,
                                    axis_name: str = "tp"):
    """Ring allgather-matmul whose chunk dots run the fused b8 W4A16
    kernel on static K-slices of the N-sharded quantized weight.

    `qt` is the LOCAL weight shard (prepare_for_kernels output, b8
    layout, shape (N/tp, K)); K must split into tp slices each a
    multiple of the kernel's K tile. Weights stay packed in HBM on every
    device; each ring step dequantizes one K-slice inside the MXU
    pipeline while the ppermute moves the next activation chunk.
    """
    from compressed_tensors_tpu.ops.kernels.w4a16_matmul import w4a16_matmul

    kind, n, k, k_pad, group_size, tk = qt.kernel_meta
    assert kind == "w4b8", kind
    assert k == k_pad, "ring slicing requires unpadded K"
    ks = k // tp
    assert ks % tk == 0, (ks, tk)
    rows_w = ks // 2          # byte rows per K-slice
    rows_s = ks // group_size  # scale rows per K-slice

    def chunk_fn(src):
        if qt.kernel_packed.ndim == 3:
            wp = qt.kernel_packed[:, src * rows_w:(src + 1) * rows_w, :]
        else:
            wp = qt.kernel_packed[src * rows_w:(src + 1) * rows_w, :]
        sc = qt.kernel_scales[src * rows_s:(src + 1) * rows_s, :]
        co = qt.kernel_zp[src * rows_s:(src + 1) * rows_s, :]

        def f(x_chunk):
            return w4a16_matmul(
                x_chunk, wp, sc, co, n=qt.shape[0], k=ks,
                group_size=group_size, tk=tk, out_dtype=jnp.float32,
                mode="int4b",
            )

        return f

    return ring_allgather_matmul_fn(
        x_shard, [chunk_fn(s) for s in range(tp)], axis_name)
