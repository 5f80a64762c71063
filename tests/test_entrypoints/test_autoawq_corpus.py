"""AutoAWQ converter corpus, second sweep — the reference cases beyond
the existing round-trip/oracle tests (ref tests/test_entrypoints/convert/
converters/test_autoawq.py): the nibble-order golden, targeted-GEMM tensor
processing with and without zero points, config construction from an
autoawq quantization_config, dependency resolution, and validation."""

import numpy as np
import pytest

from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.entrypoints.convert import AutoAWQConverter
from compressed_tensors_tpu.quantization import QuantizationStatus


def _pack_int4(values: np.ndarray) -> np.ndarray:
    values = values.astype(np.int64)
    packed = np.zeros((values.shape[0], values.shape[1] // 8),
                      dtype=np.int64)
    for offset in range(8):
        packed |= values[:, offset::8] << (offset * 4)
    return packed.astype(np.int32)


def test_unpack_awq_and_reverse_order():
    """The nibble-order golden: [0..7] packed AWQ-style unpacks in place
    and re-orders to [0, 4, 1, 5, 2, 6, 3, 7] (ref :21)."""
    packed_values = np.array([[0, 1, 2, 3, 4, 5, 6, 7]], dtype=np.int8)
    qweight = _pack_int4(packed_values)

    unpacked, _ = AutoAWQConverter.unpack_awq(qweight, None, bits=4)
    reordered, _ = AutoAWQConverter.reverse_awq_order(unpacked, None,
                                                      bits=4)
    np.testing.assert_array_equal(unpacked & 15, packed_values)
    np.testing.assert_array_equal(
        reordered & 15, np.array([[0, 4, 1, 5, 2, 6, 3, 7]], np.int8))


@pytest.mark.parametrize("zero_point", [True, False])
def test_converter_processes_gemm_tensors(zero_point):
    """Targeted qweight/qzeros/scales become CT weight_packed/
    weight_shape/weight_scale[/packed zp]; untargeted tensors pass
    through (ref :37)."""
    converter = AutoAWQConverter(group_size=2, targets=[r"re:.*proj$"],
                                 zero_point=zero_point)
    qweight_values = np.array([[8, 9, 10, 11, 12, 13, 14, 15],
                               [0, 1, 2, 3, 4, 5, 6, 7]], dtype=np.int8)
    tensors = {
        "model.layers.0.mlp.up_proj.qweight": _pack_int4(qweight_values),
        "model.layers.0.mlp.up_proj.scales": np.ones((1, 8), np.float16),
        "model.embed_tokens.weight": np.ones((4, 4), np.float32),
    }
    if zero_point:
        tensors["model.layers.0.mlp.up_proj.qzeros"] = _pack_int4(
            np.full((1, 8), 8, np.int8))

    converter.validate(tensors)
    converter.process(tensors)

    base = "model.layers.0.mlp.up_proj"
    for gone in ("qweight", "qzeros", "scales", "weight"):
        assert f"{base}.{gone}" not in tensors
    assert tensors[f"{base}.weight_packed"].shape == (8, 1)
    np.testing.assert_array_equal(tensors[f"{base}.weight_shape"],
                                  np.asarray([8, 2]))
    assert tensors[f"{base}.weight_scale"].shape == (8, 1)
    if zero_point:
        assert tensors[f"{base}.weight_zero_point"].shape == (1, 1)
    else:
        assert f"{base}.weight_zero_point" not in tensors
    # untargeted tensor untouched
    assert "model.embed_tokens.weight" in tensors


def test_config_from_autoawq_config():
    converter = AutoAWQConverter.from_autoawq_config({
        "bits": 4,
        "group_size": 64,
        "zero_point": True,
        "version": "gemm",
        "modules_to_not_convert": ["vision_tower"],
    })
    config = converter.create_config()
    scheme = config.config_groups["config_group_0"]

    assert config.format == CompressionFormat.pack_quantized.value
    assert config.quantization_status == QuantizationStatus.COMPRESSED
    assert config.ignore == ["lm_head", "re:.*vision_tower.*"]
    assert scheme.format == CompressionFormat.pack_quantized.value
    assert scheme.weights.num_bits == 4
    assert scheme.weights.group_size == 64
    assert scheme.weights.symmetric is False


def test_converter_dependencies():
    converter = AutoAWQConverter(targets=[r"re:.*down_proj$"])
    assert converter.get_dependencies(
        "model.layers.0.mlp.down_proj.qweight") == {
        "model.layers.0.mlp.down_proj.qzeros",
        "model.layers.0.mlp.down_proj.scales",
    }
    # untargeted module: no dependencies
    assert converter.get_dependencies(
        "model.layers.0.mlp.up_proj.qweight") == set()

    symmetric = AutoAWQConverter(targets=[r"re:.*down_proj$"],
                                 zero_point=False)
    assert symmetric.get_dependencies(
        "model.layers.0.mlp.down_proj.qweight") == {
        "model.layers.0.mlp.down_proj.scales"}


def test_validate_requires_dependencies():
    converter = AutoAWQConverter()
    with pytest.raises(ValueError, match="without corresponding"):
        converter.validate({
            "model.layers.0.mlp.down_proj.qweight": np.zeros((1, 8),
                                                             np.int32)})
