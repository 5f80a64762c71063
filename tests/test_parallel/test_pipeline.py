"""Pipeline parallelism tests on the virtual 8-device CPU mesh: the
pp-sharded microbatched forward must match the plain single-device forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.models.config import LlamaConfig
from compressed_tensors_tpu.models.llama import llama_forward
from compressed_tensors_tpu.models.synthetic import make_synthetic_llama
from compressed_tensors_tpu.parallel.mesh import make_mesh, shard_llama_params
from compressed_tensors_tpu.parallel.pipeline import (
    pipeline_forward,
    stack_stage_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CFG = LlamaConfig(
    vocab_size=256, hidden_size=128, intermediate_size=256,
    num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
    head_dim=32,
)


def _stage_pytree(params, mesh, n_stages):
    from jax.sharding import NamedSharding, PartitionSpec as P

    stages = stack_stage_params(params["layers"], n_stages)
    stages = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("pp"))), stages
    )
    return {
        "embed_tokens": params["embed_tokens"],
        "norm": params["norm"],
        "lm_head": params["lm_head"],
        "stages": stages,
    }


@pytest.mark.parametrize("preset", ["W4A16", "W8A8"])
def test_pipeline_matches_plain_forward(preset):
    params = make_synthetic_llama(CFG, preset=preset, use_kernels=False,
                                  dtype=jnp.float32)
    B, S = 4, 8
    ids = (jnp.arange(B * S, dtype=jnp.int32) % CFG.vocab_size).reshape(B, S)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))

    want, _ = jax.jit(lambda p, i, q: llama_forward(p, CFG, i, q))(
        params, ids, pos
    )
    want = np.asarray(want)

    mesh = make_mesh(pp=2, tp=2, dp=2)
    pp_params = _stage_pytree(params, mesh, n_stages=2)

    got = jax.jit(
        lambda p, i, q: pipeline_forward(p, CFG, i, q, mesh,
                                         n_microbatches=2)
    )(pp_params, ids, pos)
    # W8A8's dynamic int8 act-quant amplifies tp reduction-order noise into
    # single-step rounding flips; compare with an absolute bound only
    atol = 2e-3 if preset == "W4A16" else 5e-2
    np.testing.assert_allclose(np.asarray(got), want, atol=atol)


def test_pipeline_four_stages_four_microbatches():
    params = make_synthetic_llama(CFG, preset="W4A16", use_kernels=False,
                                  dtype=jnp.float32)
    B, S = 8, 4
    ids = (jnp.arange(B * S, dtype=jnp.int32) % CFG.vocab_size).reshape(B, S)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    want, _ = llama_forward(params, CFG, ids, pos)

    mesh = make_mesh(pp=4, tp=2)
    pp_params = _stage_pytree(params, mesh, n_stages=4)
    got = jax.jit(
        lambda p, i, q: pipeline_forward(p, CFG, i, q, mesh,
                                         n_microbatches=4)
    )(pp_params, ids, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-3)
