"""Expert-parallel + tensor-parallel sharding of the MoE model on the
virtual 8-device CPU mesh: sharded forward must match single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.models.config import LlamaConfig
from compressed_tensors_tpu.models.llama import llama_forward
from compressed_tensors_tpu.models.synthetic import make_synthetic_llama
from compressed_tensors_tpu.parallel.mesh import make_mesh, shard_llama_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CFG = LlamaConfig(
    vocab_size=256, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=32, num_local_experts=4, num_experts_per_tok=2,
    moe_intermediate_size=128,
)


def _forward(params, ids, pos):
    logits, _ = llama_forward(params, CFG, ids, pos)
    return logits


def test_moe_dp_ep_tp_sharded_matches_single():
    params = make_synthetic_llama(CFG, preset="W4A16", use_kernels=False,
                                  dtype=jnp.float32)
    ids = jnp.arange(32, dtype=jnp.int32).reshape(4, 8) % CFG.vocab_size
    pos = jnp.broadcast_to(jnp.arange(8), (4, 8))
    want = np.asarray(jax.jit(_forward)(params, ids, pos))

    mesh = make_mesh(dp=2, ep=2, tp=2)
    assert dict(mesh.shape) == {"dp": 2, "pp": 1, "sp": 1, "ep": 2, "tp": 2}
    sharded = shard_llama_params(params, mesh)

    # expert leaves actually sharded over ep (and tp where divisible)
    qt = sharded["layers"][0]["moe"]["experts"]["gate_proj"]
    spec = qt.weight_packed.sharding.spec
    assert spec[0] == "ep"

    from jax.sharding import NamedSharding, PartitionSpec as P

    ids_s = jax.device_put(ids, NamedSharding(mesh, P("dp", None)))
    pos_s = jax.device_put(pos, NamedSharding(mesh, P("dp", None)))
    got = np.asarray(jax.jit(_forward)(sharded, ids_s, pos_s))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_dense_model_on_five_axis_mesh():
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32,
    )
    params = make_synthetic_llama(cfg, preset="W8A8", use_kernels=False,
                                  dtype=jnp.float32)
    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_llama_params(params, mesh)
    ids = jnp.arange(16, dtype=jnp.int32).reshape(2, 8)
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    logits, _ = jax.jit(
        lambda p, i, q: llama_forward(p, cfg, i, q)
    )(sharded, ids, pos)
    assert np.isfinite(np.asarray(logits, dtype=np.float32)).all()
