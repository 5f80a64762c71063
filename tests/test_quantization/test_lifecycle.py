"""Lifecycle: apply config / initialize shapes / calibrate / QDQ forward /
compress (mirrors reference tests: test_initialize.py shape table,
test_apply.py, test_static_lifecycle.py, test_dynamic_lifecycle.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationConfig,
    QuantizationStatus,
    preset_name_to_scheme,
)
from compressed_tensors_tpu.quantization.lifecycle import (
    apply_quantization_config,
    calibrate_module,
    compress_quantized_weights,
    expected_qparam_shapes,
    initialize_module_for_quantization,
    quantized_module_forward,
)
from compressed_tensors_tpu.utils.match import ModuleInfo


# shape table from ref initialize.py:198-250 via its test_initialize.py
@pytest.mark.parametrize("args,observed,expected", [
    (QuantizationArgs(strategy="tensor"), (64, 128), (1,)),
    (QuantizationArgs(strategy="channel"), (64, 128), (64, 1)),
    (QuantizationArgs(group_size=32), (64, 128), (64, 4)),
    (QuantizationArgs(strategy="tensor_group", group_size=16), (64, 128),
     (64, 8)),
    (QuantizationArgs(strategy="block", block_structure=[16, 32]), (64, 128),
     (4, 4)),
    (QuantizationArgs(strategy="attn_head"), (8, 10, 64), (8, 1, 1)),
    (QuantizationArgs(strategy="token", dynamic=True), (64, 128), None),
])
def test_expected_qparam_shapes(args, observed, expected):
    if args.strategy == "token":
        assert expected_qparam_shapes(args, observed) is None
    else:
        assert expected_qparam_shapes(args, observed) == expected


def test_initialize_module_state():
    scheme = preset_name_to_scheme("W4A16_ASYM", ["Linear"])
    state = initialize_module_for_quantization(scheme, (64, 256))
    assert state.status == QuantizationStatus.INITIALIZED
    assert state.qparams["weight_scale"].shape == (64, 2)
    assert state.qparams["weight_zero_point"].shape == (64, 2)
    assert state.qparams["weight_zero_point"].dtype == jnp.int8


def test_initialize_tensor_group_global_scale():
    scheme = preset_name_to_scheme("NVFP4A16", ["Linear"])
    state = initialize_module_for_quantization(scheme, (64, 256))
    assert "weight_global_scale" in state.qparams
    assert state.qparams["weight_global_scale"].shape == (1,)
    assert state.qparams["weight_scale"].shape == (64, 16)


def test_initialize_dynamic_skips_qparams():
    scheme = preset_name_to_scheme("W8A8", ["Linear"])
    state = initialize_module_for_quantization(scheme, (64, 256))
    # weight: channel static
    assert state.qparams["weight_scale"].shape == (64, 1)
    # input: dynamic token -> no static scale
    assert "input_scale" not in state.qparams


def test_apply_quantization_config():
    modules = {
        "model.layers.0.self_attn.q_proj": ModuleInfo("Linear"),
        "model.layers.0.mlp.gate_proj": ModuleInfo("Linear"),
        "model.norm": ModuleInfo("RMSNorm"),
        "lm_head": ModuleInfo("Linear"),
    }
    shapes = {
        "model.layers.0.self_attn.q_proj": (64, 256),
        "model.layers.0.mlp.gate_proj": (128, 256),
        "lm_head": (1000, 256),
    }
    config = QuantizationConfig(
        config_groups={"W4A16": ["Linear"]},
        ignore=["lm_head"],
    )
    states = apply_quantization_config(modules, shapes, config)
    assert set(states) == {"model.layers.0.self_attn.q_proj",
                           "model.layers.0.mlp.gate_proj"}
    assert states["model.layers.0.mlp.gate_proj"].qparams[
        "weight_scale"].shape == (128, 2)


def test_apply_kv_cache_scheme():
    modules = {
        "model.layers.0.self_attn": ModuleInfo("LlamaAttention"),
        "model.layers.0.self_attn.q_proj": ModuleInfo("Linear"),
    }
    config = QuantizationConfig(
        config_groups={"FP8_DYNAMIC": ["Linear"]},
        kv_cache_scheme=QuantizationArgs(num_bits=8, type="float",
                                         strategy="tensor"),
    )
    states = apply_quantization_config(
        modules, {"model.layers.0.self_attn.q_proj": (64, 64)}, config
    )
    attn = states["model.layers.0.self_attn"]
    assert "k_scale" in attn.qparams and "v_scale" in attn.qparams


def test_static_lifecycle_walk(rng):
    """INITIALIZED -> CALIBRATION -> (frozen) -> COMPRESSED, with QDQ
    forward consistency at each stage."""
    scheme = preset_name_to_scheme("W4A16", ["Linear"])
    w = jnp.asarray((rng.normal(size=(32, 256)) * 0.1).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))

    state = initialize_module_for_quantization(scheme, w.shape,
                                               weight_dtype=jnp.float32)
    assert state.status == QuantizationStatus.INITIALIZED

    state = calibrate_module(state, weight=w)
    assert state.status == QuantizationStatus.CALIBRATION
    assert float(jnp.max(state.qparams["weight_scale"])) > 0

    y_calib = quantized_module_forward(x, w, state)
    assert np.isfinite(np.asarray(y_calib)).all()

    state.status = QuantizationStatus.FROZEN
    y_frozen = quantized_module_forward(x, w, state)
    np.testing.assert_allclose(np.asarray(y_calib), np.asarray(y_frozen))

    state, wq = compress_quantized_weights(state, w)
    assert state.status == QuantizationStatus.COMPRESSED
    assert wq.dtype == jnp.int8

    # compressed forward skips weight QDQ; feeding the dequantized weight
    # reproduces the fake-quant result
    from compressed_tensors_tpu.ops.quantize import dequantize

    w_dq = dequantize(wq, state.qparams["weight_scale"], None, scheme.weights)
    y_comp = quantized_module_forward(x, w_dq.astype(jnp.float32), state)
    np.testing.assert_allclose(np.asarray(y_comp), np.asarray(y_frozen),
                               atol=1e-4, rtol=1e-3)


def test_dynamic_lifecycle(rng):
    scheme = preset_name_to_scheme("W8A8", ["Linear"])
    w = jnp.asarray((rng.normal(size=(32, 64)) * 0.1).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))

    state = initialize_module_for_quantization(scheme, w.shape,
                                               weight_dtype=jnp.float32)
    state = calibrate_module(state, weight=w)
    y = quantized_module_forward(x, w, state)
    # int8 W8A8 QDQ is a good approximation
    err = np.abs(np.asarray(y) - np.asarray(x @ w.T)).mean()
    assert err < 0.05


def test_quantization_disabled(rng):
    scheme = preset_name_to_scheme("W4A16", ["Linear"])
    w = jnp.asarray((rng.normal(size=(32, 256)) * 0.1).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    state = initialize_module_for_quantization(scheme, w.shape,
                                               weight_dtype=jnp.float32)
    state = calibrate_module(state, weight=w)
    state.enabled = False
    y = quantized_module_forward(x, w, state)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w.T),
                               rtol=1e-5, atol=1e-6)
