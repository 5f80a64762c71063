"""Mixed-scheme (per-layer W4A16/W8A8, BASELINE config 5) sharding:
sharded forward on the virtual 8-device CPU mesh must match single-device,
and the fused kernel path must compose with shard_map (data-parallel and
tensor-parallel kernel invocations)."""


from compressed_tensors_tpu.flags import set_flags

set_flags(pallas_interpret=True)

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from compressed_tensors_tpu.models.config import LlamaConfig
from compressed_tensors_tpu.models.llama import llama_forward
from compressed_tensors_tpu.models.synthetic import (
    _synthetic_qt,
    make_synthetic_llama,
)
from compressed_tensors_tpu.parallel.mesh import make_mesh, shard_llama_params
from compressed_tensors_tpu.quantization import preset_name_to_scheme

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CFG = LlamaConfig(
    vocab_size=256, hidden_size=128, intermediate_size=256,
    num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
    head_dim=32,
)
MIXED = ["W4A16", "W8A8"]


def _forward(params, ids, pos):
    logits, _ = llama_forward(params, CFG, ids, pos, use_kernels=False)
    return logits


def test_mixed_scheme_dp_sp_tp_sharded_matches_single():
    """Per-layer W4A16/W8A8 model on a (dp, sp, tp) mesh: GSPMD-sharded
    logits == single-device logits (the BASELINE config 5 shape)."""
    params = make_synthetic_llama(CFG, layer_presets=MIXED,
                                  use_kernels=False, dtype=jnp.float32)
    B, S = 4, 16
    ids = jnp.arange(B * S, dtype=jnp.int32).reshape(B, S) % CFG.vocab_size
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    want = np.asarray(jax.jit(_forward)(params, ids, pos))

    mesh = make_mesh(dp=2, sp=2, tp=2)
    sharded = shard_llama_params(params, mesh)
    ids_s = jax.device_put(ids, NamedSharding(mesh, P("dp", "sp")))
    pos_s = jax.device_put(pos, NamedSharding(mesh, P("dp", "sp")))
    got = np.asarray(jax.jit(_forward)(sharded, ids_s, pos_s))
    # tolerance note: the W8A8 layers' int8 dots are emulated in f32 on the
    # CPU test backend, whose 24-bit mantissa rounds K*127^2-scale partial
    # sums — splitting the contraction over tp changes which roundings
    # happen. On TPU the MXU accumulates int32 exactly.
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def test_mixed_scheme_kernels_under_shard_map():
    """The fused Pallas kernel path (W4A16 + W8A8 matmul kernels, flash
    prefill) runs under shard_map data parallelism and matches the jnp
    path shard-for-shard."""
    params = make_synthetic_llama(CFG, layer_presets=MIXED,
                                  use_kernels=True, dtype=jnp.float32)
    mesh = make_mesh(dp=8)
    B, S = 8, 8
    ids = jnp.arange(B * S, dtype=jnp.int32).reshape(B, S) % CFG.vocab_size
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))

    def _fwd(use_kernels):
        def local(params, ids, pos):
            logits, _ = llama_forward(params, CFG, ids, pos,
                                      use_kernels=use_kernels)
            return logits

        return jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=(P(), P("dp"), P("dp")),
            out_specs=P("dp"), check_vma=False,
        ))

    got = np.asarray(_fwd(True)(params, ids, pos), np.float32)
    want = np.asarray(_fwd(False)(params, ids, pos), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_tp_sharded_w4a16_kernel_matches_unsharded():
    """Kernel-layout W4A16 weights N-sharded over tp inside shard_map:
    all-gathered output equals the unsharded fused kernel."""
    from compressed_tensors_tpu.ops.kernels.w4a16_matmul import w4a16_matmul
    from compressed_tensors_tpu.ops.linear import quantized_matmul

    tp = 8
    mesh = make_mesh(tp=tp)
    N, K = 128 * tp, 256
    scheme = preset_name_to_scheme("W4A16", ["Linear"])
    qt = _synthetic_qt(np.random.default_rng(0), (N, K), scheme,
                       jnp.float32, use_kernels=True)
    kind, n, k, k_pad, group_size, tk = qt.kernel_meta
    assert kind == "w4b8"  # default layout: byte-packed (nt, K/2, tn)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((16, K)) * 0.1, jnp.float32)

    def tp_matmul(x, wp, sc, corr):
        local = w4a16_matmul(x, wp, sc, corr, n=n // tp, k=k_pad,
                             group_size=group_size, tk=tk,
                             out_dtype=jnp.float32, mode="int4b")
        return jax.lax.all_gather(local, "tp", axis=1, tiled=True)

    # tiled layout shards its output-feature dim through the tile width
    # (dim 2); scales/corr shard their N dim
    wp_spec = (P("tp", None, None) if qt.kernel_packed.shape[0] % tp == 0
               else P(None, None, "tp"))
    y_tp = jax.jit(jax.shard_map(
        tp_matmul, mesh=mesh,
        in_specs=(P(), wp_spec, P(None, "tp"), P(None, "tp")),
        out_specs=P(), check_vma=False,
    ))(x, qt.kernel_packed, qt.kernel_scales, qt.kernel_zp)
    y_ref = quantized_matmul(x, qt, use_kernels=True)
    np.testing.assert_allclose(np.asarray(y_tp, np.float32),
                               np.asarray(y_ref, np.float32),
                               atol=5e-3, rtol=5e-2)
