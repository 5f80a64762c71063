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


def test_unsupported_layers_fall_back(rng):
    # actorder layers keep the XLA path
    from compressed_tensors_tpu.quantization import QuantizationScheme

    scheme = QuantizationScheme(
        targets=["Linear"],
        weights={"num_bits": 4, "type": "int", "strategy": "group",
                 "group_size": 64, "symmetric": True, "actorder": "group"},
    )
    args = scheme.weights
    w = (rng.normal(size=(32, 128)) * 0.1).astype(np.float32)
    g = w.reshape(32, -1, 64)
    scale, _ = calculate_qparams(jnp.asarray(g.min(-1)), jnp.asarray(g.max(-1)),
                                 args)
    g_idx = jnp.asarray(np.repeat(np.arange(2), 64).astype(np.int32))
    state = {"weight": jnp.asarray(w), "weight_scale": scale,
             "weight_g_idx": g_idx}
    compressed = PackedQuantizationCompressor.compress(state, scheme)
    qt = from_compressed_state(compressed, scheme)
    qt = prepare_for_kernels(qt)
    assert qt.kernel_packed is None
