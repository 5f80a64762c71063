"""Multi-process distributed layer tests (the reference's
test_offload/test_distributed_* analogues, SURVEY §4 TPU translation).

Every test in this file actually crosses the process boundary: the jaxrun
decorator spawns N jax.distributed processes on the CPU backend and runs
the body in each. Exercises the entry points that only matter on real
multi-host bring-up: init_dist, broadcast_object, wait_for_comms,
shard-per-process checkpoint loading, cross-process collectives, and the
work-partitioned parallel compression recouple.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from conftest import jaxrun  # noqa: E402


pytestmark = pytest.mark.multiprocess


@jaxrun(world_size=2)
def test_init_dist_and_object_broadcast():
    import jax

    from compressed_tensors_tpu.distributed.utils import (
        broadcast_object,
        is_distributed,
        process_count,
        process_index,
        wait_for_comms,
    )

    assert process_count() == 2
    assert is_distributed()
    assert jax.device_count() == 2
    rank = process_index()

    obj = {"payload": [1, 2, 3], "rank": 0} if rank == 0 else None
    got = broadcast_object(obj, source=0)
    assert got == {"payload": [1, 2, 3], "rank": 0}

    # movable source (ref distributed/utils.py:33-48 set_source_process)
    obj1 = ("from-one",) if rank == 1 else None
    got1 = broadcast_object(obj1, source=1)
    assert got1 == ("from-one",)

    import jax.numpy as jnp

    arr = jnp.ones((4,)) * (rank + 1)
    wait_for_comms(arr)  # no-op completion barrier on ready arrays


@jaxrun(world_size=2)
def test_cross_process_collectives():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rank = jax.process_index()
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    full = np.arange(8, dtype=np.float32).reshape(2, 4)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), full[rank : rank + 1]
    )
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(arr)
    assert float(total) == full.sum()

    # all_gather through GSPMD: replicate the sharded array
    gathered = jax.jit(
        lambda a: a, out_shardings=NamedSharding(mesh, P())
    )(arr)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(gathered)), full
    )


@jaxrun(world_size=2)
def test_shard_per_process_checkpoint_load():
    """Each process reads only its own shard's bytes from the checkpoint
    (load_sharded_params — subsumes DistributedCPUCache, SURVEY §2.9)."""
    import os
    import tempfile

    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from compressed_tensors_tpu.distributed.utils import broadcast_object
    from compressed_tensors_tpu.offload.load import load_sharded_params
    from compressed_tensors_tpu.utils.safetensors_io import save_safetensors

    rank = jax.process_index()
    rng = np.random.default_rng(7)
    w = rng.normal(size=(8, 16)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)

    if rank == 0:
        tmp = tempfile.mkdtemp(prefix="ct_mp_ckpt_")
        save_safetensors(os.path.join(tmp, "model.safetensors"),
                         {"w": w, "b": b})
    else:
        tmp = None
    tmp = broadcast_object(tmp, source=0)  # doubles as a barrier

    mesh = Mesh(np.array(jax.devices()), ("tp",))
    out = load_sharded_params(tmp, {"w": NamedSharding(mesh, P("tp", None))})

    assert out["w"].sharding.spec == P("tp", None)
    # each process holds exactly its row shard locally
    (local,) = [s for s in out["w"].addressable_shards]
    np.testing.assert_array_equal(np.asarray(local.data),
                                  w[rank * 4 : (rank + 1) * 4])
    # replicated tensor loads whole everywhere
    np.testing.assert_array_equal(np.asarray(out["b"]), b)

    # gather the global array and verify assembly
    gathered = jax.jit(
        lambda a: a, out_shardings=NamedSharding(mesh, P())
    )(out["w"])
    np.testing.assert_array_equal(np.asarray(jax.device_get(gathered)), w)


@jaxrun(world_size=2)
def test_compress_state_parallel_recouple():
    """Work-partitioned compression: each rank compresses its bin, results
    recouple via broadcast (ref module_parallel.py:53-89)."""
    import jax.numpy as jnp

    from compressed_tensors_tpu.compressors import (
        ModelCompressor,
        module_graph_from_names,
    )
    from compressed_tensors_tpu.distributed.module_parallel import (
        compress_state_parallel,
        partition_modules,
    )
    from compressed_tensors_tpu.ops import calculate_qparams

    config = {
        "config_groups": {
            "group_0": {
                "targets": ["Linear"],
                "weights": {"num_bits": 8, "type": "int",
                            "strategy": "channel", "symmetric": True},
            }
        },
        "format": "naive-quantized",
        "quant_method": "compressed-tensors",
    }
    mc = ModelCompressor.from_compression_config(config)
    args = mc.quantization_config.config_groups["group_0"].weights

    rng = np.random.default_rng(3)
    states = {}
    for i, rows in enumerate([32, 8, 8]):
        w = rng.normal(size=(rows, 16)).astype(np.float32)
        scale, _ = calculate_qparams(
            jnp.asarray(w.min(-1, keepdims=True)),
            jnp.asarray(w.max(-1, keepdims=True)), args,
        )
        states[f"m.proj{i}"] = {"weight": jnp.asarray(w),
                                "weight_scale": scale}
    modules = module_graph_from_names(list(states))

    _, owner = partition_modules(states, 2)
    assert set(owner.values()) == {0, 1}  # both ranks own work

    out = compress_state_parallel(mc, states, modules)
    # every rank ends with the FULL compressed state
    assert set(out) == set(states)
    for name in states:
        assert out[name]["weight"].dtype == jnp.int8

    # determinism across ranks: both must serialize identical bytes
    digest = {
        name: np.asarray(out[name]["weight"]).tobytes()
        for name in sorted(out)
    }
    from compressed_tensors_tpu.distributed.utils import broadcast_object

    ref = broadcast_object(digest, source=0)
    assert ref == digest


@jaxrun(world_size=2, devices_per_proc=2)
def test_tp_forward_across_processes():
    """A tp=4 sharded quantized matmul over 2 processes x 2 devices matches
    the single-host unsharded result (BASELINE config-5 seam)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from compressed_tensors_tpu.ops.linear import (
        from_compressed_state,
        quantized_matmul,
    )
    from compressed_tensors_tpu.compressors import (
        PackedQuantizationCompressor,
    )
    from compressed_tensors_tpu.ops import calculate_qparams
    from compressed_tensors_tpu.quantization import preset_name_to_scheme

    assert jax.device_count() == 4
    scheme = preset_name_to_scheme("W4A16", ["Linear"])
    args = scheme.weights

    rng = np.random.default_rng(11)
    n, k = 64, 256
    w = (rng.normal(size=(n, k)) * 0.1).astype(np.float32)
    g = w.reshape(n, -1, args.group_size)
    scale, _ = calculate_qparams(
        jnp.asarray(g.min(-1)), jnp.asarray(g.max(-1)), args)
    state = {"weight": jnp.asarray(w), "weight_scale": scale}
    compressed = PackedQuantizationCompressor.compress(state, scheme)
    qt = from_compressed_state(compressed, scheme)

    x = jnp.asarray((rng.normal(size=(8, k)) * 0.5).astype(np.float32))
    y_ref = np.asarray(quantized_matmul(x, qt, use_kernels=False))

    # shard the packed weight + scales over tp (output-feature dim), x
    # replicated; XLA inserts the collectives
    mesh = Mesh(np.array(jax.devices()).reshape(4), ("tp",))

    def shard(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    import dataclasses

    qt_sharded = dataclasses.replace(
        qt,
        weight_packed=shard(qt.weight_packed, P("tp", None)),
        scale=shard(qt.scale, P("tp", None)),
    )
    x_sharded = shard(x, P(None, None))

    y = jax.jit(
        lambda xx, ww: quantized_matmul(xx, ww, use_kernels=False),
        out_shardings=NamedSharding(mesh, P()),
    )(x_sharded, qt_sharded)
    np.testing.assert_allclose(np.asarray(jax.device_get(y)), y_ref,
                               atol=2e-5, rtol=1e-5)


@jaxrun(world_size=2, devices_per_proc=2)
def test_llama_forward_tp_across_processes():
    """Full run-compressed llama forward, tp=4-sharded over 2 processes x
    2 devices, matches the single-host forward bit-for... to fused-kernel
    tolerance (the BASELINE config-5 execution seam end to end)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from compressed_tensors_tpu.distributed.utils import broadcast_object
    from compressed_tensors_tpu.models import (
        llama_forward,
        load_llama_params,
    )
    from compressed_tensors_tpu.parallel.mesh import (
        make_mesh,
        shard_llama_params,
    )

    rank = jax.process_index()
    rng = np.random.default_rng(5)

    if rank == 0:
        import pathlib

        sys.path.insert(0, str(Path(__file__).parent.parent))
        from testing_utils import make_tiny_llama_checkpoint

        qc = {"config_groups": {"group_0": {
                "targets": ["Linear"],
                "weights": {"num_bits": 4, "type": "int", "symmetric": True,
                            "strategy": "group", "group_size": 32},
              }},
              "format": "pack-quantized",
              "quantization_status": "compressed",
              "quant_method": "compressed-tensors"}
        tmp = tempfile.mkdtemp(prefix="ct_mp_llama_")
        save_dir, _ = make_tiny_llama_checkpoint(
            pathlib.Path(tmp), rng, qc)
        save_dir = str(save_dir)
    else:
        save_dir = None
    save_dir = broadcast_object(save_dir, source=0)

    params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                          dtype=jnp.float32)
    ids = jnp.asarray(
        np.random.default_rng(6).integers(
            0, config.vocab_size, (2, 8)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(8), (2, 8))

    # single-host reference on this process's local devices only
    logits_ref, _ = jax.jit(
        lambda p, i, pos: llama_forward(p, config, i, pos)
    )(params, ids, positions)
    ref = np.asarray(jax.device_get(logits_ref), np.float32)

    # tp=4 over the global (2 proc x 2 dev) mesh
    mesh = make_mesh(tp=4)
    sharded = shard_llama_params(params, mesh)
    logits, _ = jax.jit(
        lambda p, i, pos: llama_forward(p, config, i, pos)
    )(sharded, ids, positions)
    from jax.sharding import NamedSharding, PartitionSpec as P

    gathered = jax.jit(lambda a: a,
                       out_shardings=NamedSharding(mesh, P()))(logits)
    got = np.asarray(jax.device_get(gathered), np.float32)
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=5e-3)
