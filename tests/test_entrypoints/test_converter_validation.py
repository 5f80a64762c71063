"""Converter protocol validation corpus, ported from the reference's
tests/test_entrypoints/convert/converters/{test_ct_dequantizer,
test_fp8block_dequantizer,test_modelopt_nvfp4}.py: process semantics on
mixed tensor dicts, validate() raising on missing/unconsumed keys, and
get_dependencies closure for cross-shard jobs."""

import numpy as np
import pytest

from compressed_tensors_tpu.entrypoints.convert.converters import (
    CompressedTensorsDequantizer,
    FP8BlockDequantizer,
    ModelOptNvfp4Converter,
)


def _create_dequantizer(ignore=None):
    quant_config = {
        "quant_method": "compressed-tensors",
        "config_groups": {
            "group_0": {
                "targets": ["re:.*mlp.*"],
                "weights": {"num_bits": 8, "type": "int",
                            "strategy": "channel", "symmetric": True,
                            "dynamic": False},
                "format": "naive-quantized",
            }
        },
        "ignore": ignore or [],
    }
    return CompressedTensorsDequantizer(quant_config)


def _create_dummy_tensors(rng):
    return {
        "model.layers.0.mlp.up_proj.weight":
            rng.integers(-128, 127, (64, 64)).astype(np.int8),
        "model.layers.0.mlp.up_proj.weight_scale":
            rng.random((64, 1)).astype(np.float32),
        "model.layers.0.mlp.down_proj.weight":
            rng.integers(-128, 127, (64, 64)).astype(np.int8),
        "model.language_model.layers.0.input_layernorm.weight":
            rng.standard_normal((64, 1)).astype(np.float32),
        "model.language_model.layers.0.pre_feedforward_layernorm.weight":
            rng.standard_normal((64, 1)).astype(np.float32),
        "model.language_model.layers.0.post_feedforward_layernorm.weight":
            rng.standard_normal((64, 1)).astype(np.float32),
        "model.layers.0.mlp.down_proj.weight_scale":
            rng.random((64, 1)).astype(np.float32),
        "model.layers.0.self_attn.q_proj.weight":
            rng.standard_normal((128, 64)).astype(np.float32),
        "model.embed_tokens.weight":
            rng.standard_normal((128, 64)).astype(np.float32),
    }


def test_process_dequantizes_targeted_layers(rng):
    dequantizer = _create_dequantizer(ignore=["model.embed_tokens"])
    tensors = _create_dummy_tensors(rng)
    qproj = tensors["model.layers.0.self_attn.q_proj.weight"].copy()
    embed = tensors["model.embed_tokens.weight"].copy()

    result = dequantizer.process(tensors)

    import ml_dtypes

    assert result["model.layers.0.mlp.up_proj.weight"].dtype == np.dtype(
        ml_dtypes.bfloat16)
    assert result["model.layers.0.mlp.down_proj.weight"].dtype == np.dtype(
        ml_dtypes.bfloat16)
    # qparams consumed
    assert "model.layers.0.mlp.up_proj.weight_scale" not in result
    assert "model.layers.0.mlp.down_proj.weight_scale" not in result
    # untargeted tensors pass through byte-for-byte
    np.testing.assert_array_equal(
        result["model.layers.0.self_attn.q_proj.weight"], qproj)
    np.testing.assert_array_equal(result["model.embed_tokens.weight"], embed)


def test_validate_passes_with_valid_tensors(rng):
    dequantizer = _create_dequantizer(ignore=["model.embed_tokens"])
    dequantizer.validate(_create_dummy_tensors(rng))


def test_validate_raises_on_missing_scale(rng):
    dequantizer = _create_dequantizer(ignore=["model.embed_tokens"])
    tensors = _create_dummy_tensors(rng)
    del tensors["model.layers.0.mlp.up_proj.weight_scale"]
    with pytest.raises(ValueError, match="Expected key"):
        dequantizer.validate(tensors)


def test_validate_raises_on_unconsumed_key(rng):
    dequantizer = _create_dequantizer(ignore=["model.embed_tokens"])
    tensors = _create_dummy_tensors(rng)
    tensors["model.layers.0.mlp.up_proj.weight_zero_point"] = np.zeros(
        (64, 1), np.int8)
    with pytest.raises(ValueError, match="unconsumed"):
        dequantizer.validate(tensors)


def test_get_dependencies_returns_scale_for_targeted_weight():
    dequantizer = _create_dequantizer()
    deps = dequantizer.get_dependencies("model.layers.0.mlp.up_proj.weight")
    assert deps == {"model.layers.0.mlp.up_proj.weight_scale"}


def test_get_dependencies_returns_empty_for_non_root_param():
    dequantizer = _create_dequantizer()
    assert dequantizer.get_dependencies(
        "model.layers.0.mlp.up_proj.weight_scale") == set()


def test_get_dependencies_returns_empty_for_ignored_module():
    dequantizer = _create_dequantizer(
        ignore=["model.layers.0.mlp.up_proj"])
    assert dequantizer.get_dependencies(
        "model.layers.0.mlp.up_proj.weight") == set()


# --------------------------------------------------------------------------- #
# FP8 block dequantizer (ref test_fp8block_dequantizer.py)

def test_fp8_block_to_bfloat16_conversion(rng):
    import ml_dtypes

    w = rng.standard_normal((256, 256)).astype(np.float32)
    # scales sized so |w|/scale stays under the fp8 e4m3 max (448)
    scale = (rng.random((2, 2)) * 0.01 + 0.02).astype(np.float32)
    wq = np.zeros_like(w)
    for i in range(2):
        for j in range(2):
            blk = w[i * 128:(i + 1) * 128, j * 128:(j + 1) * 128]
            wq[i * 128:(i + 1) * 128, j * 128:(j + 1) * 128] = (
                blk / scale[i, j])
    wq = wq.astype(ml_dtypes.float8_e4m3fn)

    conv = FP8BlockDequantizer(targets=["re:.*proj.*"])
    out = conv.process({
        "model.layers.0.mlp.up_proj.weight": wq,
        "model.layers.0.mlp.up_proj.weight_scale_inv": scale,
    })
    got = np.asarray(out["model.layers.0.mlp.up_proj.weight"], np.float32)
    assert got.shape == (256, 256)
    # fp8 e4m3 carries ~6% relative precision
    assert np.abs(got - w).max() < 0.08 * np.abs(w).max() + 0.01
    assert "model.layers.0.mlp.up_proj.weight_scale_inv" not in out


def test_fp8_block_to_bfloat16_conversion_with_padding(rng):
    """Non-multiple-of-128 dims: the trailing partial block uses its own
    scale (ref test_fp8_block_to_bfloat16_conversion_with_padding)."""
    import ml_dtypes

    w = rng.standard_normal((200, 150)).astype(np.float32) * 0.1
    scale = np.full((2, 2), 0.02, np.float32)
    wq = (w / 0.02).astype(ml_dtypes.float8_e4m3fn)

    conv = FP8BlockDequantizer(targets=["re:.*proj.*"])
    out = conv.process({
        "model.a_proj.weight": wq,
        "model.a_proj.weight_scale_inv": scale,
    })
    got = np.asarray(out["model.a_proj.weight"], np.float32)
    assert got.shape == (200, 150)
    assert np.abs(got - w).max() < 0.05


def test_fp8_block_get_dependencies():
    conv = FP8BlockDequantizer(targets=["re:.*proj.*"])
    deps = conv.get_dependencies("model.a_proj.weight")
    assert "model.a_proj.weight_scale_inv" in deps


# --------------------------------------------------------------------------- #
# ModelOpt NVFP4 (ref test_modelopt_nvfp4.py)

def test_modelopt_nvfp4_converter_process(rng):
    """input_scale / weight_scale_2 invert into global scales; weight
    renames to weight_packed (ref modelopt_nvfp4.py semantics)."""
    conv = ModelOptNvfp4Converter(targets=["re:.*proj.*"])
    packed = rng.integers(0, 255, (64, 32)).astype(np.uint8)
    tensors = {
        "model.a_proj.weight": packed,
        "model.a_proj.weight_scale": rng.random((64, 4)).astype(np.float32),
        "model.a_proj.weight_scale_2": np.asarray([0.5], np.float32),
        "model.a_proj.input_scale": np.asarray([0.25], np.float32),
    }
    out = conv.process(tensors)
    assert "model.a_proj.weight_packed" in out
    np.testing.assert_array_equal(out["model.a_proj.weight_packed"], packed)
    np.testing.assert_allclose(
        np.asarray(out["model.a_proj.weight_global_scale"], np.float32),
        [2.0])
    np.testing.assert_allclose(
        np.asarray(out["model.a_proj.input_global_scale"], np.float32),
        [4.0])
    assert "model.a_proj.weight_scale_2" not in out
    assert "model.a_proj.input_scale" not in out


def test_modelopt_nvfp4_converter_get_dependencies():
    conv = ModelOptNvfp4Converter(targets=["re:.*proj.*"])
    deps = conv.get_dependencies("model.a_proj.weight")
    assert "model.a_proj.weight_scale_2" in deps
