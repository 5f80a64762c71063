"""Preset scheme coverage + QuantizationConfig parse/serialize (mirrors
reference tests/test_quantization/test_quant_scheme.py and
test_quant_config.py + test_configs/test_bit_depths.py)."""

import json

import numpy as np
import pytest

from compressed_tensors_tpu.quantization import (
    PRESET_SCHEMES,
    QuantizationArgs,
    QuantizationConfig,
    QuantizationScheme,
    QuantizationStatus,
    preset_name_to_scheme,
)


def test_all_presets_resolve():
    for name in PRESET_SCHEMES:
        scheme = preset_name_to_scheme(name, ["Linear"])
        assert scheme.targets == ["Linear"]


@pytest.mark.parametrize("wb", [2, 3, 4, 5, 6, 7, 8])
def test_int_preset_bit_depths(wb):
    scheme = preset_name_to_scheme(f"W{wb}A16", ["Linear"])
    assert scheme.weights.num_bits == wb
    assert scheme.weights.group_size == 128
    assert scheme.weights.strategy == "group"
    assert scheme.input_activations is None


def test_w8a8_preset():
    scheme = preset_name_to_scheme("W8A8", ["Linear"])
    assert scheme.weights.strategy == "channel"
    assert scheme.input_activations.strategy == "token"
    assert scheme.input_activations.dynamic is True


def test_nvfp4_preset():
    import ml_dtypes

    scheme = preset_name_to_scheme("NVFP4", ["Linear"])
    assert scheme.weights.num_bits == 4
    assert scheme.weights.group_size == 16
    assert scheme.weights.strategy == "tensor_group"
    assert np.dtype(scheme.weights.scale_dtype) == np.dtype(ml_dtypes.float8_e4m3fn)
    assert scheme.input_activations.dynamic == "local"


def test_mxfp4_preset():
    scheme = preset_name_to_scheme("MXFP4", ["Linear"])
    assert scheme.weights.group_size == 32
    assert np.dtype(scheme.weights.scale_dtype) == np.uint8


def test_config_parses_preset_groups():
    config = QuantizationConfig(
        config_groups={"W4A16": ["Linear"]},
        format="pack-quantized",
    )
    scheme = config.config_groups["W4A16"]
    assert isinstance(scheme, QuantizationScheme)
    assert scheme.weights.num_bits == 4


def test_config_parse_real_checkpoint_json():
    """Parse a quantization_config as written by llm-compressor."""
    raw = json.loads("""
    {
      "config_groups": {
        "group_0": {
          "input_activations": null,
          "output_activations": null,
          "targets": ["Linear"],
          "weights": {
            "actorder": null, "block_structure": null, "dynamic": false,
            "group_size": 128, "num_bits": 4, "observer": "minmax",
            "observer_kwargs": {}, "strategy": "group", "symmetric": true,
            "type": "int"
          }
        }
      },
      "format": "pack-quantized",
      "global_compression_ratio": 1.89,
      "ignore": ["lm_head"],
      "kv_cache_scheme": null,
      "quant_method": "compressed-tensors",
      "quantization_status": "compressed"
    }
    """)
    config = QuantizationConfig.model_validate(raw)
    assert config.quantization_status == QuantizationStatus.COMPRESSED
    assert config.ignore == ["lm_head"]
    scheme = config.config_groups["group_0"]
    assert scheme.weights.num_bits == 4
    assert scheme.weights.group_size == 128
    assert scheme.weights.strategy == "group"
    # round trip
    restored = QuantizationConfig.model_validate(
        json.loads(config.model_dump_json())
    )
    assert restored.config_groups["group_0"].weights == scheme.weights


def test_status_lifecycle_order():
    assert QuantizationStatus.INITIALIZED < QuantizationStatus.CALIBRATION
    assert QuantizationStatus.COMPRESSED >= QuantizationStatus.FROZEN
    assert QuantizationStatus.DECOMPRESSED > QuantizationStatus.COMPRESSED
    assert QuantizationStatus.COMPRESSED > None
    assert not QuantizationStatus.COMPRESSED < None


def test_kv_cache_scheme():
    config = QuantizationConfig(
        config_groups={"FP8": ["Linear"]},
        kv_cache_scheme=QuantizationArgs(num_bits=8, type="float",
                                         strategy="tensor"),
    )
    assert config.kv_cache_scheme.num_bits == 8
    assert config.requires_calibration_data()


def test_config_merge():
    a = QuantizationConfig(config_groups={"W4A16": ["Linear"]},
                           format="pack-quantized", ignore=["lm_head", "x"])
    b = QuantizationConfig(config_groups={"W8A8": ["x"]},
                           format="int-quantized")
    with pytest.warns(UserWarning):
        a.merge(b)
    assert "x" not in a.ignore and "lm_head" in a.ignore
    assert len(a.config_groups) == 2
