"""Fused W8A8 kernel vs the jnp dynamic-quant path (interpret mode)."""


from compressed_tensors_tpu.flags import set_flags

set_flags(pallas_interpret=True)

import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from compressed_tensors_tpu.ops.linear import (
    from_compressed_state,
    prepare_for_kernels,
    quantized_matmul,
)
from compressed_tensors_tpu.quantization import preset_name_to_scheme


def _make_qt(rng, preset, n=64, k=256):
    scheme = preset_name_to_scheme(preset, ["Linear"])
    args = scheme.weights
    if args.type == "int":
        wq = rng.integers(-127, 128, size=(n, k)).astype(np.int8)
    else:
        wq = (rng.normal(size=(n, k)) * 100).astype(ml_dtypes.float8_e4m3fn)
    scale = (rng.random((n, 1)) * 2e-3 + 1e-3).astype(np.float32)
    state = {"weight": jnp.asarray(wq), "weight_scale": jnp.asarray(scale)}
    qt = from_compressed_state(state, scheme)
    return prepare_for_kernels(qt)


@pytest.mark.parametrize("preset", ["W8A8", "FP8_DYNAMIC"])
@pytest.mark.parametrize("batch", [1, 8])
def test_w8a8_kernel_matches_jnp_path(rng, preset, batch):
    qt = _make_qt(rng, preset)
    assert qt.kernel_packed is not None
    assert qt.kernel_meta[0] == "w8a8"

    # 3D input: TOKEN strategy scales are per (batch, seq) position
    x = jnp.asarray(
        (rng.normal(size=(1, batch, 256)) * 0.5).astype(np.float32)
    )
    y_kernel = quantized_matmul(x, qt, use_kernels=True)

    # reference: jnp dynamic-quant path (kernels off, explicit arg)
    y_ref = quantized_matmul(x, qt, use_kernels=False)

    np.testing.assert_allclose(
        np.asarray(y_kernel, np.float32), np.asarray(y_ref, np.float32),
        atol=5e-3, rtol=5e-2,
    )


def test_w8a8_fused_projections(rng):
    from compressed_tensors_tpu.ops.fuse import fuse_quantized_tensors

    a = _make_qt(rng, "W8A8", n=32, k=128)
    b = _make_qt(rng, "W8A8", n=16, k=128)
    fused = fuse_quantized_tensors([a, b])
    assert fused is not None
    assert fused.kernel_meta == ("w8a8", 48, 128)

    x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    y = quantized_matmul(x, fused)
    ya = quantized_matmul(x, a)
    yb = quantized_matmul(x, b)
    np.testing.assert_allclose(
        np.asarray(y, np.float32),
        np.concatenate([np.asarray(ya, np.float32),
                        np.asarray(yb, np.float32)], axis=-1),
        atol=1e-4,
    )


def test_w8a8_tiled_layout_matches_flat(rng):
    """Huge-N weights pre-tile to (N/tn, K, tn) for contiguous tile DMAs
    (the lm_head layout); numerics must match the flat layout exactly."""
    from compressed_tensors_tpu.ops.kernels.w8a8_matmul import (
        prepare_w8_weight_tiled,
        w8a8_matmul,
    )

    n, k = 700, 128  # n not a multiple of tn exercises the pad path
    wq = rng.integers(-127, 128, size=(n, k)).astype(np.int8)
    w_scale = jnp.asarray((rng.random((1, n)) * 2e-3 + 1e-3), jnp.float32)
    x = jnp.asarray(rng.normal(size=(4, k)).astype(np.float32))

    y_flat = w8a8_matmul(x, jnp.asarray(wq).T, w_scale, n=n, k=k)
    w3d = prepare_w8_weight_tiled(jnp.asarray(wq), tn=256)
    assert w3d.shape == (3, k, 256)
    y_tiled = w8a8_matmul(x, w3d, w_scale, n=n, k=k)
    np.testing.assert_allclose(
        np.asarray(y_flat, np.float32), np.asarray(y_tiled, np.float32),
        atol=1e-5, rtol=1e-5,
    )


def test_w8a8_prepare_uses_tiled_layout_for_huge_n(rng):
    """prepare_for_kernels switches to the pre-tiled layout above the
    huge-N threshold, bit-identical to the flat kernel layout."""
    from compressed_tensors_tpu.ops.kernels.w8a8_matmul import w8a8_matmul

    n, k = 9216, 128
    scheme = preset_name_to_scheme("W8A8", ["Linear"])
    wq = rng.integers(-127, 128, size=(n, k)).astype(np.int8)
    scale = (rng.random((n, 1)) * 2e-3 + 1e-3).astype(np.float32)
    qt = prepare_for_kernels(from_compressed_state(
        {"weight": jnp.asarray(wq), "weight_scale": jnp.asarray(scale)},
        scheme))
    assert qt.kernel_packed is not None and qt.kernel_packed.ndim == 3

    x = jnp.asarray(rng.normal(size=(2, k)).astype(np.float32))
    y_tiled = quantized_matmul(x, qt, use_kernels=True)
    y_flat = w8a8_matmul(x, jnp.asarray(wq).T,
                         jnp.asarray(scale.reshape(1, -1)), n=n, k=k,
                         out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(y_tiled, np.float32),
                                  np.asarray(y_flat, np.float32))


def test_fp8_transcode_to_int8_accuracy(rng):
    """FP8 W8A8 weights transcoded to the int8 MXU path at load must match
    the emulated-fp8 reference path within re-gridding tolerance
    (BASELINE config 3: serve FP8 checkpoints at int8 rate on v5e)."""
    from compressed_tensors_tpu.flags import flag_overrides

    n, k = 64, 256
    scheme = preset_name_to_scheme("FP8_DYNAMIC", ["Linear"])
    wq = (rng.normal(size=(n, k)) * 100).astype(ml_dtypes.float8_e4m3fn)
    scale = (rng.random((n, 1)) * 2e-3 + 1e-3).astype(np.float32)
    state = {"weight": jnp.asarray(wq), "weight_scale": jnp.asarray(scale)}

    with flag_overrides(fp8_transcode="always"):
        qt_i8 = prepare_for_kernels(from_compressed_state(state, scheme))
    assert qt_i8.kernel_packed.dtype == jnp.int8
    # checkpoint leaves stay fp8 (serialization unaffected)
    assert str(qt_i8.weight.dtype).startswith("float8")

    with flag_overrides(fp8_transcode="never"):
        qt_f8 = prepare_for_kernels(from_compressed_state(state, scheme))
    assert str(qt_f8.kernel_packed.dtype).startswith("float8")

    x = jnp.asarray((rng.normal(size=(8, k)) * 0.5).astype(np.float32))
    y_i8 = np.asarray(quantized_matmul(x, qt_i8, use_kernels=True),
                      np.float32)
    y_f8 = np.asarray(quantized_matmul(x, qt_f8, use_kernels=False),
                      np.float32)
    # exact reference: dequantized fp8 weights, UNquantized activations
    w_dense = np.asarray(wq, np.float32) * scale
    y_true = np.asarray(x, np.float32) @ w_dense.T

    # documented tolerance: the two paths differ mainly by activation
    # format (fp8 acts ~3-bit mantissa vs int8 acts); each approximates
    # the true product to a few percent and the transcoded path must be
    # at least as accurate as the emulated-fp8 path it replaces
    err_i8 = np.abs(y_i8 - y_true).max()
    err_f8 = np.abs(y_f8 - y_true).max()
    scale_y = np.abs(y_true).max()
    assert err_i8 <= 0.05 * scale_y, (err_i8, scale_y)
    assert err_i8 <= err_f8 * 1.1 + 1e-3, (err_i8, err_f8)
    np.testing.assert_allclose(y_i8, y_f8, atol=0.1 * scale_y)
