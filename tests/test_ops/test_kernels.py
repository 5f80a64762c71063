"""Fused Pallas kernel correctness vs the XLA dequant path (interpret mode on
CPU; the same kernels compile natively on TPU)."""


from compressed_tensors_tpu.flags import set_flags

set_flags(pallas_interpret=True)

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.compressors import PackedQuantizationCompressor
from compressed_tensors_tpu.ops import calculate_qparams
from compressed_tensors_tpu.ops.linear import (
    from_compressed_state,
    materialize_weight,
    prepare_for_kernels,
    quantized_matmul,
)
from compressed_tensors_tpu.quantization import preset_name_to_scheme


def _make_qt(rng, preset, n=64, k=256):
    scheme = preset_name_to_scheme(preset, ["Linear"])
    args = scheme.weights
    w = (rng.normal(size=(n, k)) * 0.1).astype(np.float32)
    g = w.reshape(n, -1, args.group_size)
    mn, mx = g.min(-1), g.max(-1)
    scale, zp = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)
    state = {"weight": jnp.asarray(w), "weight_scale": scale}
    if not args.symmetric:
        state["weight_zero_point"] = zp
    compressed = PackedQuantizationCompressor.compress(state, scheme)
    qt = from_compressed_state(compressed, scheme)
    return prepare_for_kernels(qt), w


@pytest.mark.parametrize("preset", ["W4A16", "W4A16_ASYM"])
@pytest.mark.parametrize("batch", [1, 4, 16])
def test_w4a16_kernel_matches_xla_path(rng, preset, batch):
    qt, w = _make_qt(rng, preset, n=64, k=256)
    assert qt.kernel_packed is not None, "kernel layout should be prepared"
    # TK = 8 * group_size
    assert qt.kernel_meta[5] == 1024

    x = jnp.asarray((rng.normal(size=(batch, 256)) * 0.5).astype(np.float32))

    y_kernel = quantized_matmul(x, qt)

    w_dense = materialize_weight(qt, dtype=jnp.float32)
    y_ref = np.asarray(x, np.float32) @ np.asarray(w_dense, np.float32).T

    np.testing.assert_allclose(
        np.asarray(y_kernel, np.float32), y_ref, atol=2e-2, rtol=1e-2
    )


def test_w4a16_kernel_3d_input(rng):
    qt, _ = _make_qt(rng, "W4A16", n=64, k=256)
    x = jnp.asarray((rng.normal(size=(2, 3, 256)) * 0.5).astype(np.float32))
    y = quantized_matmul(x, qt)
    assert y.shape == (2, 3, 64)

    w_dense = materialize_weight(qt, dtype=jnp.float32)
    y_ref = np.einsum("bsk,nk->bsn", np.asarray(x, np.float32),
                      np.asarray(w_dense, np.float32))
    np.testing.assert_allclose(np.asarray(y, np.float32), y_ref,
                               atol=2e-2, rtol=1e-2)


def test_actorder_g_idx_rides_fused_kernel(rng):
    """actorder (g_idx) checkpoints get the fused kernel via a load-time
    column permutation + runtime x gather (r5; previously XLA fallback),
    and still match the XLA dequant oracle."""
    from compressed_tensors_tpu.quantization import QuantizationScheme

    scheme = QuantizationScheme(
        targets=["Linear"],
        weights={"num_bits": 4, "type": "int", "strategy": "group",
                 "group_size": 64, "symmetric": True, "actorder": "group"},
    )
    args = scheme.weights
    n, k = 32, 256
    w = (rng.normal(size=(n, k)) * 0.1).astype(np.float32)
    # a PERMUTED group assignment (the GPTQ actorder shape): each group
    # still has exactly group_size columns, scattered over k
    perm_groups = rng.permutation(k // 64)
    g_idx_cols = np.empty(k, np.int32)
    for j, gidx in enumerate(perm_groups):
        g_idx_cols[j * 64 : (j + 1) * 64] = gidx
    order = np.argsort(g_idx_cols, kind="stable")
    w_grouped = w[:, order].reshape(n, -1, 64)
    scale, _ = calculate_qparams(jnp.asarray(w_grouped.min(-1)),
                                 jnp.asarray(w_grouped.max(-1)), args)
    state = {"weight": jnp.asarray(w), "weight_scale": scale,
             "weight_g_idx": jnp.asarray(g_idx_cols)}
    compressed = PackedQuantizationCompressor.compress(state, scheme)
    qt = from_compressed_state(compressed, scheme)
    qt = prepare_for_kernels(qt)
    assert qt.kernel_packed is not None
    assert qt.kernel_perm is not None

    x = jnp.asarray((rng.normal(size=(4, k)) * 0.5).astype(np.float32))
    y = np.asarray(quantized_matmul(x, qt))
    w_dense = np.asarray(materialize_weight(qt, dtype=jnp.float32))
    y_ref = np.asarray(x, np.float32) @ w_dense.T
    np.testing.assert_allclose(y, y_ref, atol=2e-2 * np.abs(y_ref).max(),
                               rtol=2e-2)


def test_unsupported_layers_fall_back(rng):
    # non-group strategies keep the XLA path in prepare_for_kernels
    from compressed_tensors_tpu.quantization import QuantizationScheme

    scheme = QuantizationScheme(
        targets=["Linear"],
        weights={"num_bits": 4, "type": "int", "strategy": "channel",
                 "symmetric": True},
    )
    args = scheme.weights
    w = (rng.normal(size=(32, 128)) * 0.1).astype(np.float32)
    scale, _ = calculate_qparams(
        jnp.asarray(w.min(-1, keepdims=True)),
        jnp.asarray(w.max(-1, keepdims=True)), args)
    state = {"weight": jnp.asarray(w), "weight_scale": scale}
    compressed = PackedQuantizationCompressor.compress(state, scheme)
    qt = from_compressed_state(compressed, scheme)
    qt = prepare_for_kernels(qt)
    assert qt.kernel_packed is None
