"""Collective-overlapped TP matmuls (parallel/overlap.py) vs the GSPMD
reference on the virtual device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from compressed_tensors_tpu.parallel.mesh import make_mesh
from compressed_tensors_tpu.parallel.overlap import (
    matmul_reducescatter,
    ring_allgather_matmul,
)

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs the virtual multi-device mesh"
)


@needs_devices
@pytest.mark.parametrize("tp", [2, 4])
def test_ring_allgather_matmul_matches_dense(rng, tp):
    mesh = make_mesh(tp=tp)
    B, K, N = 8, 64, 32
    x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))

    y = jax.jit(jax.shard_map(
        lambda xs, wl: ring_allgather_matmul(xs, wl),
        mesh=mesh, in_specs=(P(None, "tp"), P("tp", None)),
        out_specs=P(None, "tp"), check_vma=False,
    ))(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ np.asarray(w).T,
                               atol=1e-4, rtol=1e-4)


@needs_devices
@pytest.mark.parametrize("tp", [2, 4])
def test_matmul_reducescatter_matches_dense(rng, tp):
    mesh = make_mesh(tp=tp)
    B, K, N = 8, 64, 32
    x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))

    y = jax.jit(jax.shard_map(
        lambda xs, wk: matmul_reducescatter(xs, wk),
        mesh=mesh, in_specs=(P(None, "tp"), P(None, "tp")),
        out_specs=P(None, "tp"), check_vma=False,
    ))(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ np.asarray(w).T,
                               atol=1e-4, rtol=1e-4)


@needs_devices
def test_overlap_pair_composes_like_mlp(rng):
    """allgather-matmul (column-parallel) into reducescatter-matmul
    (row-parallel) — the Megatron TP pair — equals the dense MLP."""
    tp = 4
    mesh = make_mesh(tp=tp)
    B, H, I = 8, 64, 128
    x = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w_up = jnp.asarray(rng.normal(size=(I, H)).astype(np.float32))
    w_down = jnp.asarray(rng.normal(size=(H, I)).astype(np.float32))

    def mlp(xs, wu, wd):
        h = ring_allgather_matmul(xs, wu)        # (B, I/tp)
        h = jax.nn.gelu(h)
        return matmul_reducescatter(h, wd)       # (B, H/tp)

    y = jax.jit(jax.shard_map(
        mlp, mesh=mesh,
        in_specs=(P(None, "tp"), P("tp", None), P(None, "tp")),
        out_specs=P(None, "tp"), check_vma=False,
    ))(x, w_up, w_down)

    ref = np.asarray(jax.nn.gelu(x @ w_up.T)) @ np.asarray(w_down).T
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-3, rtol=1e-3)
