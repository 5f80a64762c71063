"""Mesh-sharded serving: the ServingEngine with tensor-parallel params and
a tp-sharded KV cache must produce exactly the completions of the
single-device engine for the same requests (BASELINE config 5 as a
*serving* config — the r3 engine had no mesh awareness).

Runs on the virtual 8-device CPU mesh (tests/conftest.py)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from testing_utils import make_tiny_llama_checkpoint  # noqa: E402

from compressed_tensors_tpu.engine import Request, ServingEngine  # noqa: E402
from compressed_tensors_tpu.models import load_llama_params  # noqa: E402
from compressed_tensors_tpu.parallel.mesh import make_mesh  # noqa: E402

W4A16_G32 = {
    "config_groups": {
        "group_0": {
            "targets": ["Linear"],
            "weights": {"num_bits": 4, "type": "int", "strategy": "group",
                        "group_size": 32, "symmetric": True},
        }
    },
    "format": "pack-quantized",
    "ignore": ["lm_head"],
    "quant_method": "compressed-tensors",
    "quantization_status": "frozen",
}

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs the virtual multi-device mesh"
)


def _requests(rng, config, n=3):
    return [
        Request(request_id=i,
                prompt_ids=rng.integers(
                    0, config.vocab_size, size=(4 + i,)).tolist(),
                max_new_tokens=5)
        for i in range(n)
    ]


def _run(params, config, requests, mesh=None, **kwargs):
    engine = ServingEngine(params, config, dtype=jnp.float32,
                           max_batch=2, max_len=32, prefill_chunk=4,
                           mesh=mesh, **kwargs)
    for r in requests:
        engine.submit(r)
    return {c.request_id: (c.output_ids, c.finish_reason)
            for c in engine.run()}


@needs_devices
@pytest.mark.parametrize("axes", [dict(tp=2), dict(dp=2, tp=2),
                                  dict(tp=4)])
def test_sharded_engine_matches_single_device(rng, tmp_path, axes):
    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, W4A16_G32)
    params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                          dtype=jnp.float32)
    reqs = _requests(rng, config)
    ref = _run(params, config, [Request(**vars(r)) for r in reqs])
    mesh = make_mesh(**axes)
    got = _run(params, config, reqs, mesh=mesh)
    assert got == ref


@needs_devices
def test_sharded_paged_engine_matches_single_device(rng, tmp_path):
    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, W4A16_G32)
    params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                          dtype=jnp.float32)
    reqs = _requests(rng, config)
    ref = _run(params, config, [Request(**vars(r)) for r in reqs],
               paged=True, page_size=8)
    mesh = make_mesh(tp=2)
    got = _run(params, config, reqs, mesh=mesh, paged=True, page_size=8)
    assert got == ref


@needs_devices
def test_sharded_cache_layout(rng, tmp_path):
    """The KV pool really is tp-sharded (not silently replicated) and the
    slot bookkeeping arrays stay replicated."""
    from jax.sharding import PartitionSpec as P

    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, W4A16_G32)
    params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                          dtype=jnp.float32)
    mesh = make_mesh(tp=2)
    engine = ServingEngine(params, config, dtype=jnp.float32, max_batch=2,
                           max_len=32, mesh=mesh)
    kvh_axis = engine.cache.k.sharding.spec[2]
    if engine.cache.k.shape[2] % 2 == 0:
        assert kvh_axis == "tp"
    assert engine.cache.lengths.sharding.spec == P()


# --------------------------------------------------------------------------- #
# r5: the actual BASELINE config-5 shape — MIXED per-layer schemes through the
# sharded engine, plus preemption and prefix caching exercised under a mesh.

MIXED_W4_W8 = {
    "config_groups": {
        "group_w4": {
            "targets": [r"re:.*layers\.0\..*"],
            "weights": {"num_bits": 4, "type": "int", "strategy": "group",
                        "group_size": 32, "symmetric": True},
        },
        "group_w8": {
            "targets": [r"re:.*layers\.1\..*"],
            "weights": {"num_bits": 8, "type": "int", "strategy": "channel",
                        "symmetric": True},
            "input_activations": {"num_bits": 8, "type": "int",
                                  "strategy": "token", "symmetric": True,
                                  "dynamic": True},
        },
    },
    "format": "mixed-precision",
    "ignore": ["lm_head"],
    "quant_method": "compressed-tensors",
    "quantization_status": "frozen",
}


def _mixed_params(rng, tmp_path):
    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, MIXED_W4_W8)
    return load_llama_params(save_dir, run_compressed=True,
                             dtype=jnp.float32)


@needs_devices
@pytest.mark.parametrize("axes", [dict(tp=2), dict(dp=2, tp=2)])
def test_mixed_scheme_sharded_engine_matches_single_device(
        rng, tmp_path, axes):
    """Per-layer W4A16/W8A8 (the config-5 mixed-precision shape) through
    ServingEngine(mesh=...): token-for-token vs the single-device engine."""
    params, config, mc = _mixed_params(rng, tmp_path)
    assert mc.quantization_config.format == "mixed-precision"
    reqs = _requests(rng, config)
    ref = _run(params, config, [Request(**vars(r)) for r in reqs])
    got = _run(params, config, reqs, mesh=make_mesh(**axes))
    assert got == ref


@needs_devices
def test_mixed_scheme_sharded_paged_engine(rng, tmp_path):
    params, config, _ = _mixed_params(rng, tmp_path)
    reqs = _requests(rng, config)
    ref = _run(params, config, [Request(**vars(r)) for r in reqs],
               paged=True, page_size=8)
    got = _run(params, config, reqs, mesh=make_mesh(tp=2), paged=True,
               page_size=8)
    assert got == ref


@needs_devices
def test_preemption_under_mesh_matches_dense(rng, tmp_path):
    """Oversubscribed paged pool preempts + requeues under a tp-sharded
    cache and still reproduces the unsharded dense engine's outputs."""
    params, config, _ = _mixed_params(rng, tmp_path)
    mesh = make_mesh(tp=2)
    engine = ServingEngine(params, config, dtype=jnp.float32, max_batch=2,
                           max_len=32, prefill_chunk=8, paged=True,
                           page_size=8, num_pages=5, mesh=mesh)
    dense = ServingEngine(params, config, dtype=jnp.float32, max_batch=2,
                          max_len=32, prefill_chunk=8)

    prompts = [rng.integers(0, config.vocab_size, size=(10,)).tolist()
               for _ in range(2)]
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=i, prompt_ids=p,
                              max_new_tokens=12))
        dense.submit(Request(request_id=i, prompt_ids=p,
                             max_new_tokens=12))
    got = {c.request_id: c.output_ids for c in engine.run()}
    ref = {c.request_id: c.output_ids for c in dense.run()}
    assert engine.preemptions >= 1
    assert got == ref
    # no page leaked from the sharded pool
    assert (len(engine._free_pages) + len(engine._cached_free)
            + len(engine._page_ref) == 4)


@needs_devices
def test_prefix_caching_under_mesh_matches_dense(rng, tmp_path):
    """Prefix-cache page reuse with a tp-sharded page pool: cached pages
    hit and completions match the unsharded engine exactly."""
    params, config, _ = _mixed_params(rng, tmp_path)
    engine = ServingEngine(params, config, dtype=jnp.float32, max_batch=2,
                           max_len=64, prefill_chunk=8, paged=True,
                           page_size=8, mesh=make_mesh(tp=2))
    dense = ServingEngine(params, config, dtype=jnp.float32, max_batch=2,
                          max_len=64, prefill_chunk=8)

    shared = rng.integers(0, config.vocab_size, size=(17,)).tolist()
    outs, ref_outs = [], []
    for i, n_tail in enumerate((3, 5)):
        tail = rng.integers(0, config.vocab_size, size=(n_tail,)).tolist()
        engine.submit(Request(request_id=i, prompt_ids=shared + tail,
                              max_new_tokens=4))
        outs += engine.run()
        dense.submit(Request(request_id=i, prompt_ids=shared + tail,
                             max_new_tokens=4))
        ref_outs += dense.run()

    assert engine.prefix_cache_hits == 2  # two full shared pages reused
    got = {c.request_id: c.output_ids for c in outs}
    ref = {c.request_id: c.output_ids for c in ref_outs}
    assert got == ref


@needs_devices
def test_sharded_burst_decode_matches_per_step(rng, tmp_path):
    """Multi-step decode bursts under a (dp, tp) mesh equal per-step
    decode on the same mesh (the burst path is the production decode)."""
    params, config, _ = _mixed_params(rng, tmp_path)
    mesh = make_mesh(dp=2, tp=2)
    reqs = _requests(rng, config)
    per_step = _run(params, config, [Request(**vars(r)) for r in reqs],
                    mesh=mesh, steps_per_sync=1)
    burst = _run(params, config, reqs, mesh=mesh, steps_per_sync=4)
    assert burst == per_step
