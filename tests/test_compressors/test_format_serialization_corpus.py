"""CompressionFormat serialization corpus, ported from the reference's
tests/test_configs/test_compression_format.py: the enum round-trips
through JSON standalone, inside dicts, inside QuantizationScheme, and
inside QuantizationConfig — this IS the on-disk config.json vocabulary."""

import json

import pytest

from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.quantization import (
    QuantizationConfig,
    QuantizationScheme,
)


def test_compression_format_serializable():
    fmt = CompressionFormat.int_quantized
    json_str = json.dumps(fmt)
    assert json_str == '"int-quantized"'
    assert CompressionFormat(json.loads(json_str)) == fmt


def test_compression_format_all_values():
    for fmt in CompressionFormat:
        json_str = json.dumps(fmt)
        assert isinstance(json_str, str)
        assert CompressionFormat(json.loads(json_str)) == fmt


def test_compression_format_in_dict():
    d = {"format": CompressionFormat.pack_quantized, "other_field": "value"}
    parsed = json.loads(json.dumps(d, default=str))
    assert parsed["format"] == "pack-quantized"
    assert parsed["other_field"] == "value"


def test_compression_format_in_scheme():
    scheme = QuantizationScheme(targets=["Linear"],
                                format=CompressionFormat.int_quantized)
    scheme_dict = scheme.model_dump()
    assert scheme_dict["format"] == "int-quantized"
    assert isinstance(scheme_dict["format"], str)
    parsed = json.loads(json.dumps(scheme_dict))
    assert parsed["format"] == "int-quantized"
    reloaded = QuantizationScheme.model_validate(parsed)
    assert reloaded.format == CompressionFormat.int_quantized


def test_compression_format_in_config():
    config = QuantizationConfig(
        config_groups={"group_1": QuantizationScheme(targets=[])},
        format=CompressionFormat.float_quantized.value,
    )
    config_dict = config.to_dict()
    assert config_dict["format"] == "float-quantized"
    assert isinstance(config_dict["format"], str)
    parsed = json.loads(json.dumps(config_dict))
    assert parsed["format"] == "float-quantized"
    reloaded = QuantizationConfig.model_validate(parsed)
    assert reloaded.format == "float-quantized"


@pytest.mark.parametrize(
    "format_value",
    [
        CompressionFormat.dense,
        CompressionFormat.int_quantized,
        CompressionFormat.float_quantized,
        CompressionFormat.pack_quantized,
        CompressionFormat.naive_quantized,
        CompressionFormat.mixed_precision,
        CompressionFormat.nvfp4_pack_quantized,
        CompressionFormat.mxfp4_pack_quantized,
    ],
)
def test_compression_format_round_trip(format_value):
    config = QuantizationConfig(
        config_groups={"group_1": QuantizationScheme(targets=["Linear"])},
        format=format_value.value,
    )
    parsed = json.loads(json.dumps(config.to_dict()))
    reloaded = QuantizationConfig.model_validate(parsed)
    assert reloaded.format == format_value.value
    assert config == reloaded
