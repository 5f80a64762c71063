"""Quantized-forward corpus, ported from the reference's
tests/test_quantization/lifecycle/test_forward.py:44-300
(the set_forward_quantized family): every combination of input / weight /
output activation quantization through the module forward, the disabled
toggle, and the COMPRESSED-status weight-QDQ skip — realized on
`quantized_module_forward` (this framework's functional analogue of the
reference's forward monkey-patch)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationScheme,
    QuantizationStatus,
)
from compressed_tensors_tpu.quantization.lifecycle import (
    ModuleQuantState,
    initialize_module_for_quantization,
    quantized_module_forward,
)

A8 = dict(num_bits=8, type="int", symmetric=True, strategy="tensor")


def _scheme(weights=None, inputs=None, outputs=None):
    return QuantizationScheme(
        targets=["Linear"],
        weights=QuantizationArgs(**weights) if weights else None,
        input_activations=QuantizationArgs(**inputs) if inputs else None,
        output_activations=QuantizationArgs(**outputs) if outputs else None,
    )


def _calibrate(state, base, value):
    """Per-tensor min-max calibration (the reference's
    mock_per_tensor_calibration fixture, tests/conftest.py:21-101)."""
    from compressed_tensors_tpu.ops import calculate_qparams

    args = getattr(state.scheme, {
        "weight": "weights", "input": "input_activations",
        "output": "output_activations"}[base])
    mn = jnp.min(value).reshape(1)
    mx = jnp.max(value).reshape(1)
    scale, zp = calculate_qparams(mn, mx, args)
    state.qparams[f"{base}_scale"] = scale
    state.qparams[f"{base}_zero_point"] = zp


def _forward(state, x, w, bias=None):
    return np.asarray(
        quantized_module_forward(jnp.asarray(x), jnp.asarray(w), state,
                                 bias=bias), np.float32)


@pytest.fixture
def layer(rng):
    w = (rng.standard_normal((4, 4)) * 10).astype(np.float32)
    x = rng.standard_normal((2, 4)).astype(np.float32)
    return w, x


def _init(scheme, w, status=QuantizationStatus.INITIALIZED):
    state = initialize_module_for_quantization(
        scheme, weight_shape=w.shape, weight_dtype=jnp.float32)
    state.status = status
    return state


def test_forward_no_quantization(layer):
    """No scheme -> plain linear (ref :109)."""
    w, x = layer
    state = ModuleQuantState(scheme=None,
                             status=QuantizationStatus.INITIALIZED)
    out = _forward(state, x, w)
    np.testing.assert_allclose(out, x @ w.T, rtol=1e-6)


def test_forward_disabled(layer):
    """state.enabled False behaves like a normal linear (ref :122)."""
    w, x = layer
    state = _init(_scheme(weights=A8), w)
    _calibrate(state, "weight", jnp.asarray(w))
    state.enabled = False
    out = _forward(state, x, w)
    np.testing.assert_allclose(out, x @ w.T, rtol=1e-6)


@pytest.mark.parametrize("status", [QuantizationStatus.INITIALIZED,
                                    QuantizationStatus.CALIBRATION,
                                    QuantizationStatus.FROZEN])
def test_forward_with_input_activations(layer, status):
    """Input activation quantization changes the output (ref :148)."""
    w, x = layer
    state = _init(_scheme(inputs=A8), w, status)
    _calibrate(state, "input", jnp.asarray(x))
    out = _forward(state, x, w)
    assert out.shape == (2, 4)
    assert not np.allclose(out, x @ w.T, atol=1e-3)


@pytest.mark.parametrize("status", [QuantizationStatus.INITIALIZED,
                                    QuantizationStatus.CALIBRATION,
                                    QuantizationStatus.FROZEN])
def test_forward_with_weight_quantization(layer, status):
    """Weight QDQ applies below COMPRESSED status (ref :179)."""
    w, x = layer
    state = _init(_scheme(weights=A8), w, status)
    _calibrate(state, "weight", jnp.asarray(w))
    out = _forward(state, x, w)
    assert out.shape == (2, 4)
    assert not np.allclose(out, x @ w.T, atol=1e-3)


def test_forward_compressed_status_skips_weight_qdq(layer):
    """At COMPRESSED status the weight passes through untouched — it is
    already the quantized representation (ref :212)."""
    w, x = layer
    state = _init(_scheme(weights=A8), w, QuantizationStatus.COMPRESSED)
    _calibrate(state, "weight", jnp.asarray(w))
    out = _forward(state, x, w)
    np.testing.assert_allclose(out, x @ w.T, rtol=1e-6)


def test_forward_with_output_activations(layer):
    """Output activation quantization quantizes the result (ref :239)."""
    w, x = layer
    state = _init(_scheme(outputs=A8), w, QuantizationStatus.CALIBRATION)
    ref_out = x @ w.T
    _calibrate(state, "output", jnp.asarray(ref_out))
    out = _forward(state, x, w)
    assert out.shape == (2, 4)
    assert not np.allclose(out, ref_out, atol=1e-4)
    # but it must be the fake-quantized version of the true output
    scale = float(state.qparams["output_scale"][0])
    np.testing.assert_allclose(out, ref_out, atol=scale + 1e-6)


def test_forward_full_quantization(layer):
    """Input + weight + output quantization compose (ref :266)."""
    w, x = layer
    state = _init(
        _scheme(weights=A8, inputs=A8, outputs=A8), w,
        QuantizationStatus.CALIBRATION)
    _calibrate(state, "weight", jnp.asarray(w))
    _calibrate(state, "input", jnp.asarray(x))
    _calibrate(state, "output", jnp.asarray(x @ w.T))
    out = _forward(state, x, w)
    assert out.shape == (2, 4)
    assert np.isfinite(out).all()


def test_forward_with_bias(layer, rng):
    w, x = layer
    bias = rng.standard_normal(4).astype(np.float32)
    state = ModuleQuantState(scheme=None,
                             status=QuantizationStatus.INITIALIZED)
    out = _forward(state, x, w, bias=jnp.asarray(bias))
    np.testing.assert_allclose(out, x @ w.T + bias, rtol=1e-6)


def test_forward_dynamic_input(layer):
    """Dynamic token-strategy inputs need no calibration (ref dynamic
    lifecycle, test_dynamic_lifecycle.py)."""
    w, x = layer
    state = _init(_scheme(inputs=dict(num_bits=8, type="int",
                                      symmetric=True, strategy="token",
                                      dynamic=True)), w)
    out = _forward(state, x, w)
    assert out.shape == (2, 4)
    assert not np.allclose(out, x @ w.T, atol=1e-3)


def test_quantization_enabled_disabled_context(layer):
    """The global disable context restores plain execution
    (ref tests/test_quantization/lifecycle/test_enabled.py)."""
    from compressed_tensors_tpu.quantization.lifecycle import (
        disable_quantization,
        enable_quantization,
    )

    w, x = layer
    state = _init(_scheme(weights=A8), w)
    _calibrate(state, "weight", jnp.asarray(w))
    quant_out = _forward(state, x, w)
    try:
        disable_quantization()
        plain_out = _forward(state, x, w)
    finally:
        enable_quantization()
    np.testing.assert_allclose(plain_out, x @ w.T, rtol=1e-6)
    assert not np.allclose(plain_out, quant_out, atol=1e-4)


# Embedding forwards (ref test_forward.py:53-107) ------------------------ #


def _embed_forward(state, indices, table):
    from compressed_tensors_tpu.quantization.lifecycle import (
        quantized_embedding_forward,
    )

    return np.asarray(
        quantized_embedding_forward(jnp.asarray(indices), jnp.asarray(table),
                                    state), np.float32)


def test_embedding_forward_no_quantization(rng):
    """Without a scheme the quantized embedding forward is a plain gather
    (ref test_set_forward_quantized_embedding_no_quantization :63)."""
    table = rng.standard_normal((10, 4)).astype(np.float32)
    state = ModuleQuantState(scheme=None)
    idx = np.array([0, 1, 2, 3])
    np.testing.assert_array_equal(_embed_forward(state, idx, table),
                                  table[idx])


def test_embedding_forward_with_weight_quantization(rng):
    """Weight QDQ applies to the gathered rows
    (ref test_set_forward_quantized_embedding_with_weight_quantization :79)."""
    table = (rng.standard_normal((10, 4)) * 10).astype(np.float32)
    scheme = QuantizationScheme(
        targets=["Embedding"],
        weights=QuantizationArgs(num_bits=8, symmetric=True,
                                 strategy="tensor"),
    )
    state = _init(scheme, table, status=QuantizationStatus.CALIBRATION)
    _calibrate(state, "weight", jnp.asarray(table))
    idx = np.array([0, 1, 2, 3])
    out = _embed_forward(state, idx, table)
    assert out.shape == (4, 4)
    # quantized rows differ from the raw table but stay close
    assert not np.allclose(out, table[idx], atol=1e-5)
    np.testing.assert_allclose(out, table[idx], atol=0.2)


def test_embedding_forward_ignores_activation_args(rng):
    """Input/output activation args on an embedding scheme are ignored —
    indices are integers (matches the reference's weight-only embedding
    path)."""
    table = rng.standard_normal((6, 4)).astype(np.float32)
    scheme = QuantizationScheme(
        targets=["Embedding"],
        input_activations=QuantizationArgs(num_bits=8, symmetric=True,
                                           strategy="tensor", dynamic=True),
        output_activations=QuantizationArgs(num_bits=8, symmetric=True,
                                            strategy="tensor", dynamic=True),
    )
    state = ModuleQuantState(scheme=scheme)
    idx = np.array([5, 0])
    np.testing.assert_array_equal(_embed_forward(state, idx, table),
                                  table[idx])


def test_embedding_forward_compressed_status_skips_qdq(rng):
    """COMPRESSED status skips weight QDQ in the embedding forward, same
    as the linear forward (ref forward.py COMPRESSED gate)."""
    table = (rng.standard_normal((10, 4)) * 10).astype(np.float32)
    scheme = QuantizationScheme(
        targets=["Embedding"],
        weights=QuantizationArgs(num_bits=8, symmetric=True,
                                 strategy="tensor"),
    )
    state = _init(scheme, table, status=QuantizationStatus.COMPRESSED)
    _calibrate(state, "weight", jnp.asarray(table))
    idx = np.array([1, 2])
    np.testing.assert_array_equal(_embed_forward(state, idx, table),
                                  table[idx])


def test_embedding_forward_per_channel(rng):
    """Per-channel weight scales (one per embedding row) QDQ before the
    gather, matching fake_quantize on the full table."""
    from compressed_tensors_tpu.ops.quantize import fake_quantize

    table = (rng.standard_normal((8, 4)) * 5).astype(np.float32)
    scheme = QuantizationScheme(
        targets=["Embedding"],
        weights=QuantizationArgs(num_bits=8, symmetric=True,
                                 strategy="channel"),
    )
    state = _init(scheme, table, status=QuantizationStatus.CALIBRATION)
    from compressed_tensors_tpu.ops import calculate_qparams

    mn = jnp.min(jnp.asarray(table), axis=1, keepdims=True)
    mx = jnp.max(jnp.asarray(table), axis=1, keepdims=True)
    scale, zp = calculate_qparams(mn, mx, scheme.weights)
    state.qparams["weight_scale"] = scale
    state.qparams["weight_zero_point"] = zp

    idx = np.array([3, 7])
    out = _embed_forward(state, idx, table)
    expect = np.asarray(fake_quantize(jnp.asarray(table), scale, zp,
                                      scheme.weights))[idx]
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_embedding_through_apply_pipeline(rng):
    """Full seam: a config targeting Embedding applies, initializes
    per-channel qparams at the table's shape, and the quantized embedding
    forward consumes them (ref apply+initialize+set_forward_quantized on
    torch.nn.Embedding)."""
    from compressed_tensors_tpu.quantization import QuantizationConfig
    from compressed_tensors_tpu.quantization.lifecycle import (
        apply_quantization_config,
    )
    from compressed_tensors_tpu.utils.match import ModuleInfo

    cfg = QuantizationConfig.model_validate({
        "config_groups": {"group_0": {
            "targets": ["Embedding"],
            "weights": {"num_bits": 8, "type": "int", "symmetric": True,
                        "strategy": "channel"}}},
        "quant_method": "compressed-tensors",
        "quantization_status": "calibration"})
    mods = {"model.embed_tokens": ModuleInfo(type_name="Embedding"),
            "model.layers.0.mlp.up_proj": ModuleInfo(type_name="Linear")}
    shapes = {"model.embed_tokens": (50, 8),
              "model.layers.0.mlp.up_proj": (8, 8)}
    states = apply_quantization_config(mods, shapes, cfg)
    # only the embedding matched the Embedding target
    assert sorted(states) == ["model.embed_tokens"]
    state = states["model.embed_tokens"]
    assert state.qparams["weight_scale"].shape == (50, 1)

    table = (rng.standard_normal((50, 8)) * 4).astype(np.float32)
    from compressed_tensors_tpu.ops import calculate_qparams

    mn = jnp.min(jnp.asarray(table), axis=1, keepdims=True)
    mx = jnp.max(jnp.asarray(table), axis=1, keepdims=True)
    scale, zp = calculate_qparams(mn, mx, state.scheme.weights)
    state.qparams["weight_scale"] = scale
    state.qparams["weight_zero_point"] = zp

    idx = np.array([0, 7, 49])
    out = _embed_forward(state, idx, table)
    assert out.shape == (3, 8)
    np.testing.assert_allclose(out, table[idx], atol=0.1)
