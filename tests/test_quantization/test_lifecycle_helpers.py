"""Global QDQ gate (ref lifecycle/helpers.py) + CompressedLinear stub."""

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.quantization import preset_name_to_scheme
from compressed_tensors_tpu.quantization.lifecycle import (
    ModuleQuantState,
    calibrate_module,
    disable_quantization,
    enable_quantization,
    initialize_module_for_quantization,
    quantization_enabled,
    quantized_module_forward,
)


def test_enable_disable_quantization(rng):
    scheme = preset_name_to_scheme("W8A8", ["Linear"])
    w = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 32)).astype(np.float32))
    state = initialize_module_for_quantization(scheme, w.shape)
    state = calibrate_module(state, weight=w)

    assert quantization_enabled()
    y_q = np.asarray(quantized_module_forward(x, w, state))
    try:
        disable_quantization()
        assert not quantization_enabled()
        y_raw = np.asarray(quantized_module_forward(x, w, state))
    finally:
        enable_quantization()
    assert quantization_enabled()

    np.testing.assert_allclose(y_raw, np.asarray(x @ w.T), atol=1e-6)
    # QDQ must actually change the result when enabled
    assert not np.allclose(y_q, y_raw, atol=1e-6)
    y_q2 = np.asarray(quantized_module_forward(x, w, state))
    np.testing.assert_allclose(y_q2, y_q, atol=1e-6)


def test_compressed_linear_stub():
    from compressed_tensors_tpu.linear import CompressedLinear

    with pytest.raises(NotImplementedError, match="no longer supported"):
        CompressedLinear.from_linear(None)
    with pytest.raises(NotImplementedError):
        CompressedLinear()
