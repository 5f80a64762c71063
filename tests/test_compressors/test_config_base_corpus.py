"""Config foundations corpus, ported from the reference's
tests/test_configs/{test_base,test_infer_quant}.py: SparsityStructure
case-insensitivity and None-handling, CompressionFormat round trips, and
model-level format inference from per-module schemes."""

import pytest

from compressed_tensors_tpu.compressors.format import (
    infer_format_from_schemes,
)
from compressed_tensors_tpu.config import (
    CompressionFormat,
    SparsityStructure,
)
from compressed_tensors_tpu.quantization import preset_name_to_scheme


def test_sparsity_structure_valid_cases():
    assert SparsityStructure("2:4") == SparsityStructure.TWO_FOUR
    assert SparsityStructure("unstructured") == SparsityStructure.UNSTRUCTURED
    assert SparsityStructure("UNSTRUCTURED") == SparsityStructure.UNSTRUCTURED
    assert SparsityStructure(None) == SparsityStructure.UNSTRUCTURED


def test_sparsity_structure_invalid_case():
    with pytest.raises(ValueError,
                       match="invalid is not a valid SparsityStructure"):
        SparsityStructure("invalid")


def test_sparsity_structure_case_insensitivity():
    assert SparsityStructure("2:4".upper()) == SparsityStructure.TWO_FOUR
    assert (SparsityStructure("unstructured".upper())
            == SparsityStructure.UNSTRUCTURED)
    assert (SparsityStructure("UNSTRUCTURED".lower())
            == SparsityStructure.UNSTRUCTURED)


def test_sparsity_structure_default_case():
    assert SparsityStructure(None) == SparsityStructure.UNSTRUCTURED


@pytest.mark.parametrize(
    "preset,expected_format",
    [
        ("W8A8", "int-quantized"),
        ("W8A16", "pack-quantized"),
        ("W4A16", "pack-quantized"),
        ("FP8", "float-quantized"),
    ],
)
def test_infer_quant_format(preset, expected_format):
    """Model-level format inference over a uniform 4-Linear module set
    (ref test_infer_quant.py)."""
    schemes = [("Linear", preset_name_to_scheme(preset, ["Linear"]))
               for _ in range(4)]
    fmt = infer_format_from_schemes(schemes)
    assert fmt.value == expected_format
    # and every scheme got its per-module format written back
    for _, scheme in schemes:
        assert CompressionFormat(scheme.format).value == expected_format


def test_infer_mixed_formats():
    """Schemes inferring different formats flatten to mixed-precision
    (ref format.py:99-115 model-level flattening)."""
    schemes = [("Linear", preset_name_to_scheme("W4A16", ["Linear"])),
               ("Linear", preset_name_to_scheme("W8A8", ["Linear"]))]
    fmt = infer_format_from_schemes(schemes)
    assert fmt == CompressionFormat.mixed_precision


def test_infer_dense_for_unquantized():
    schemes = [("Linear", preset_name_to_scheme("UNQUANTIZED", ["Linear"]))]
    assert infer_format_from_schemes(schemes) == CompressionFormat.dense


def test_compression_format_enum_values():
    """The format vocabulary is the on-disk spec (ref config/base.py)."""
    expected = {
        "dense", "sparse-bitmask", "sparse-24-bitmask", "int-quantized",
        "float-quantized", "naive-quantized", "pack-quantized",
        "marlin-24", "nvfp4-pack-quantized", "mxfp4-pack-quantized",
        "mxfp8-quantized", "mixed-precision",
    }
    assert expected <= {f.value for f in CompressionFormat}
