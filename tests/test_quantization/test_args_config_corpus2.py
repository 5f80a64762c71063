"""Second args/config corpus sweep — the reference test cases not covered
by the first corpus (ref tests/test_quantization/test_quant_args.py
test_group/test_block/test_enums/test_invalid, test_quant_config.py
test_need_config_groups/test_to_dict + requires_calibration_data gates,
and test_utils/test_mxfp8_utils.py's should_generate_mx_scales gates and
E8M0 e2e exponent identity)."""

import numpy as np
import pytest
from pydantic import ValidationError

from compressed_tensors_tpu.ops.mx import (
    generate_mx_scales,
    maybe_convert_from_mx_exp,
    round_to_power_2,
    should_generate_mx_scales,
)
from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationConfig,
    QuantizationScheme,
    QuantizationStrategy,
)
from compressed_tensors_tpu.quantization.quant_args import (
    ActivationOrdering,
    QuantizationType,
    round_to_quantized_type_dtype,
)

# ------------------------------------------------------------------ args


def test_group():
    group = QuantizationArgs(strategy="group", group_size=128)
    assert group.strategy == QuantizationStrategy.GROUP
    assert group.group_size == 128

    with pytest.raises(ValueError):
        QuantizationArgs(strategy=QuantizationStrategy.GROUP, group_size=-1)
    with pytest.raises(ValueError):
        QuantizationArgs(strategy=QuantizationStrategy.GROUP)
    with pytest.raises(ValueError):
        QuantizationArgs(strategy="tensor", group_size=128)


def test_block():
    block = QuantizationArgs(strategy="block", block_structure="2x4")
    assert block.strategy == QuantizationStrategy.BLOCK
    assert block.block_structure == [2, 4]
    assert block.block_structure != "2x4"


def test_enums():
    assert QuantizationArgs(
        type=QuantizationType.INT,
        strategy=QuantizationStrategy.GROUP,
        actorder=ActivationOrdering.WEIGHT,
        group_size=1,
    ) == QuantizationArgs(type="InT", strategy="GROUP", actorder="weight",
                          group_size=1)


def test_invalid():
    with pytest.raises(ValidationError):
        QuantizationArgs(type="invalid")
    with pytest.raises(ValidationError):
        QuantizationArgs(strategy="invalid")
    with pytest.raises(ValidationError):
        QuantizationArgs(strategy=QuantizationStrategy.GROUP)


# ---------------------------------------------------------------- config


def test_need_config_groups():
    with pytest.raises(ValidationError):
        QuantizationScheme()


def test_to_dict():
    config = QuantizationConfig(
        config_groups={
            "group_1": QuantizationScheme(
                targets=["Linear"],
                weights=QuantizationArgs(num_bits=4, symmetric=True,
                                         group_size=128),
            ),
            "group_2": QuantizationScheme(
                targets=["Conv2d"],
                weights=QuantizationArgs(num_bits=8),
            ),
        },
        global_compression_ratio=3.5,
        ignore=["model.layers.0"],
        quantization_status="compressed",
        format="int-quantized",
    )
    config_dict = config.to_dict()
    assert "config_groups" in config_dict
    assert config_dict["format"] == "int-quantized"
    assert config_dict["quantization_status"] == "compressed"
    assert QuantizationConfig.model_validate(config_dict) == config


def test_imatrix_mse_weight_observer_requires_calibration_data():
    config = QuantizationConfig(config_groups={"g": QuantizationScheme(
        targets=["Linear"],
        weights=QuantizationArgs(num_bits=4, group_size=128,
                                 observer="imatrix_mse"),
    )})
    assert config.requires_calibration_data()


def test_default_weight_observer_does_not_require_calibration_data():
    config = QuantizationConfig(config_groups={"g": QuantizationScheme(
        targets=["Linear"],
        weights=QuantizationArgs(num_bits=4, group_size=128),
    )})
    assert not config.requires_calibration_data()


# ------------------------------------------------------------- MX gates

_UINT8 = np.dtype(np.uint8)


def _mx_args(bits, strategy="group", group_size=32, uint8=True):
    kw = dict(num_bits=bits, type="float", strategy=strategy)
    if strategy == "group":
        kw["group_size"] = group_size
    if uint8:
        kw.update(scale_dtype=_UINT8, zp_dtype=_UINT8)
    return QuantizationArgs(**kw)


def test_should_generate_mx_scales_mxfp8():
    assert should_generate_mx_scales(_mx_args(8)) is True


def test_should_generate_mx_scales_mxfp4():
    assert should_generate_mx_scales(_mx_args(4)) is True


def test_should_generate_mx_scales_regular_fp8():
    assert should_generate_mx_scales(
        QuantizationArgs(num_bits=8, type="float", strategy="tensor")
    ) is False


def test_should_generate_mx_scales_wrong_group_size():
    assert should_generate_mx_scales(
        _mx_args(8, group_size=128, uint8=False)
    ) is False


@pytest.mark.parametrize("dtype", ["bfloat16", "float16", "float32"])
def test_mxfp8_scales_e2e(dtype, rng):
    """E8M0 exponent identity: generated scales decode to
    2^(floor(log2(pow2(max))) - 8) exactly (ref test_mxfp8_scales_e2e)."""
    import jax.numpy as jnp

    from compressed_tensors_tpu.utils.dtypes import parse_dtype

    w = (rng.normal(0.0002, 0.0576, size=(288, 288))).astype(np.float32)
    x = jnp.asarray(w, dtype=parse_dtype(dtype)).reshape(288, -1, 32)
    min_vals = jnp.minimum(jnp.min(x, axis=-1), 0)
    max_vals = jnp.maximum(jnp.max(x, axis=-1), 0)
    block_max = jnp.maximum(jnp.abs(min_vals), jnp.abs(max_vals))

    args = _mx_args(8)
    scales = generate_mx_scales(block_max, num_bits=8)
    scales = round_to_quantized_type_dtype(scales, dtype=args.scale_dtype)
    converted = maybe_convert_from_mx_exp(args=args, scale=scales)

    scales_exp = np.log2(np.asarray(converted, np.float64))
    p2 = np.asarray(round_to_power_2(block_max.astype(jnp.float32)),
                    np.float64)
    block_max_exp = np.floor(np.log2(p2)) - 8
    np.testing.assert_array_equal(scales_exp, block_max_exp)
