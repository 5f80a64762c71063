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


@needs_devices
def test_ring_quantized_overlap_matches_dense(rng):
    """The fused-b8-kernel ring (dequant-GEMM overlapped with the
    activation ppermute) equals the dense TP matmul."""
    import dataclasses

    import jax as _jax

    from compressed_tensors_tpu.compressors import (
        PackedQuantizationCompressor,
    )
    from compressed_tensors_tpu.flags import set_flags
    from compressed_tensors_tpu.ops import calculate_qparams
    from compressed_tensors_tpu.ops.linear import (
        from_compressed_state,
        materialize_weight,
        prepare_for_kernels,
    )
    from compressed_tensors_tpu.parallel.overlap import (
        ring_allgather_matmul_quantized,
    )
    from compressed_tensors_tpu.quantization import preset_name_to_scheme

    set_flags(pallas_interpret=True)
    tp = 2
    mesh = make_mesh(tp=tp)
    scheme = preset_name_to_scheme("W4A16", ["Linear"])
    args = scheme.weights
    N, K = 64, 2048  # K/tp = 1024 = one kernel K-tile per ring slice

    def make_shard(seed):
        r = np.random.default_rng(seed)
        w = (r.normal(size=(N // tp, K)) * 0.1).astype(np.float32)
        g = w.reshape(N // tp, -1, args.group_size)
        scale, _ = calculate_qparams(jnp.asarray(g.min(-1)),
                                     jnp.asarray(g.max(-1)), args)
        comp = PackedQuantizationCompressor.compress(
            {"weight": jnp.asarray(w), "weight_scale": scale}, scheme)
        return prepare_for_kernels(from_compressed_state(comp, scheme))

    shards = [make_shard(s) for s in range(tp)]
    w_dense = np.concatenate(
        [np.asarray(materialize_weight(q, dtype=jnp.float32))
         for q in shards], axis=0)  # (N, K)

    stacked = _jax.tree.map(lambda *xs: jnp.stack(xs), *shards)
    meta = shards[0].kernel_meta

    x = jnp.asarray(rng.normal(size=(8, K)).astype(np.float32))

    def body(xs, wp, sc, co):
        local = dataclasses.replace(
            shards[0], kernel_packed=wp[0], kernel_scales=sc[0],
            kernel_zp=co[0], kernel_meta=meta)
        return ring_allgather_matmul_quantized(xs, local, tp)

    y = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, "tp"), P("tp"), P("tp"), P("tp")),
        out_specs=P(None, "tp"), check_vma=False,
    ))(x, stacked.kernel_packed, stacked.kernel_scales, stacked.kernel_zp)

    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ w_dense.T,
                               atol=2e-2, rtol=2e-2)
