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
