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
