"""Per-format compressor round trips + format inference (mirrors reference
tests/test_compressors coverage: test_pack_quant, test_fp4_quant,
test_mxfp4_quant, test_mxfp8_quant, test_compression_format)."""

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.compressors import (
    BaseCompressor,
    infer_module_format,
)
from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.ops import calculate_qparams, generate_gparam
from compressed_tensors_tpu.quantization import (
    QuantizationScheme,
    preset_name_to_scheme,
)


def _observe(w, args):
    if args.strategy == "channel":
        mn = w.min(axis=-1, keepdims=True)
        mx = w.max(axis=-1, keepdims=True)
    elif args.strategy in ("group", "tensor_group"):
        g = w.reshape(w.shape[0], -1, args.group_size)
        mn, mx = g.min(-1), g.max(-1)
    elif args.strategy == "tensor":
        mn, mx = w.min(), w.max()
    elif args.strategy == "block":
        bh, bw = args.block_structure
        r, c = w.shape
        b = w.reshape(r // bh, bh, c // bw, bw).transpose(0, 2, 1, 3)
        mn, mx = b.min(axis=(2, 3)), b.max(axis=(2, 3))
    else:
        raise ValueError(args.strategy)
    return jnp.asarray(mn), jnp.asarray(mx)


def _make_state(w, scheme, global_scale=None):
    mn, mx = _observe(np.asarray(w, dtype=np.float32), scheme.weights)
    scale, zp = calculate_qparams(mn, mx, scheme.weights,
                                  global_scale=global_scale)
    state = {"weight": jnp.asarray(w), "weight_scale": scale}
    if not scheme.weights.symmetric:
        state["weight_zero_point"] = zp
    if global_scale is not None:
        state["weight_global_scale"] = global_scale
    return state


@pytest.mark.parametrize("preset,expected_format", [
    ("W4A16", CompressionFormat.pack_quantized),
    ("W4A16_ASYM", CompressionFormat.pack_quantized),
    ("W8A8", CompressionFormat.int_quantized),
    ("FP8_DYNAMIC", CompressionFormat.float_quantized),
    ("FP8_BLOCK", CompressionFormat.float_quantized),
    ("NVFP4A16", CompressionFormat.nvfp4_pack_quantized),
    ("MXFP4A16", CompressionFormat.mxfp4_pack_quantized),
    ("MXFP8A16", CompressionFormat.mxfp8_quantized),
    ("W4AFP8", CompressionFormat.int_quantized),
])
def test_format_inference(preset, expected_format):
    scheme = preset_name_to_scheme(preset, ["Linear"])
    assert infer_module_format("Linear", scheme) == expected_format


def _roundtrip(scheme, w, fmt, global_scale=None, atol=None):
    compressor = BaseCompressor.get_value_from_registry(fmt.value)
    state = _make_state(w, scheme, global_scale=global_scale)
    compressed = compressor.compress(dict(state), scheme)
    for p in ("weight_packed", "weight"):
        if p in compressed:
            break
    decompressed = compressor.decompress(dict(compressed), scheme)
    assert "weight" in decompressed

    # decompressed weight equals fake-quantized original
    from compressed_tensors_tpu.ops import fake_quantize

    fq = fake_quantize(
        jnp.asarray(w),
        state["weight_scale"]
        if "weight_global_scale" not in state
        else state["weight_scale"],
        state.get("weight_zero_point"),
        scheme.weights,
        global_scale=global_scale,
    )
    np.testing.assert_allclose(
        np.asarray(decompressed["weight"], dtype=np.float32),
        np.asarray(fq, dtype=np.float32),
        atol=atol or 1e-4, rtol=1e-2,
    )
    return compressed, decompressed


@pytest.mark.parametrize("preset", ["W4A16", "W8A16", "W2A16"])
def test_pack_quantized_roundtrip(preset, rng):
    scheme = preset_name_to_scheme(preset, ["Linear"])
    w = rng.normal(size=(32, 256)).astype(np.float32)
    compressed, _ = _roundtrip(scheme, w, CompressionFormat.pack_quantized)
    assert compressed["weight_packed"].dtype == jnp.int32
    assert "weight_zero_point" not in compressed  # symmetric: stripped
    assert tuple(np.asarray(compressed["weight_shape"])) == (32, 256)


def test_pack_quantized_asym_roundtrip(rng):
    scheme = preset_name_to_scheme("W4A16_ASYM", ["Linear"])
    w = rng.normal(size=(32, 256)).astype(np.float32) + 0.3
    compressed, _ = _roundtrip(scheme, w, CompressionFormat.pack_quantized)
    # zero point is packed along dim 0: (ceil(32*4/32), num_groups)
    assert compressed["weight_zero_point"].dtype == jnp.int32
    assert compressed["weight_zero_point"].shape == (4, 2)


def test_naive_int8_roundtrip(rng):
    scheme = preset_name_to_scheme("W8A8", ["Linear"])
    w = rng.normal(size=(16, 64)).astype(np.float32)
    compressed, _ = _roundtrip(scheme, w, CompressionFormat.int_quantized)
    assert compressed["weight"].dtype == jnp.int8


def test_naive_fp8_roundtrip(rng):
    import ml_dtypes

    scheme = preset_name_to_scheme("FP8_DYNAMIC", ["Linear"])
    w = rng.normal(size=(16, 64)).astype(np.float32)
    compressed, _ = _roundtrip(scheme, w, CompressionFormat.float_quantized)
    assert compressed["weight"].dtype == jnp.dtype(ml_dtypes.float8_e4m3fn)


def test_fp8_block_roundtrip(rng):
    scheme = QuantizationScheme(
        targets=["Linear"],
        weights={"num_bits": 8, "type": "float", "strategy": "block",
                 "block_structure": [8, 8], "symmetric": True},
    )
    w = rng.normal(size=(16, 24)).astype(np.float32)
    _roundtrip(scheme, w, CompressionFormat.float_quantized)


def test_nvfp4_roundtrip(rng):
    scheme = preset_name_to_scheme("NVFP4A16", ["Linear"])
    w = rng.normal(size=(16, 64)).astype(np.float32)
    mn = jnp.asarray(w.min())
    mx = jnp.asarray(w.max())
    gparam = generate_gparam(mn, mx)
    compressed, decompressed = _roundtrip(
        scheme, w, CompressionFormat.nvfp4_pack_quantized,
        global_scale=gparam, atol=0.5,
    )
    import ml_dtypes

    assert compressed["weight_packed"].dtype == jnp.uint8
    assert compressed["weight_packed"].shape == (16, 32)
    assert compressed["weight_scale"].dtype == jnp.dtype(ml_dtypes.float8_e4m3fn)


def test_mxfp4_roundtrip(rng):
    scheme = preset_name_to_scheme("MXFP4A16", ["Linear"])
    w = rng.normal(size=(16, 64)).astype(np.float32)
    compressed, _ = _roundtrip(scheme, w,
                               CompressionFormat.mxfp4_pack_quantized, atol=0.5)
    assert compressed["weight_scale"].dtype == jnp.uint8
    assert compressed["weight_packed"].dtype == jnp.uint8


def test_mxfp8_roundtrip(rng):
    import ml_dtypes

    scheme = preset_name_to_scheme("MXFP8A16", ["Linear"])
    w = rng.normal(size=(16, 64)).astype(np.float32)
    compressed, _ = _roundtrip(scheme, w, CompressionFormat.mxfp8_quantized,
                               atol=0.5)
    assert compressed["weight_scale"].dtype == jnp.uint8
    assert compressed["weight"].dtype == jnp.dtype(ml_dtypes.float8_e4m3fn)


def test_compression_param_names():
    from compressed_tensors_tpu.compressors import (
        NVFP4PackedCompressor,
        PackedQuantizationCompressor,
    )

    scheme = preset_name_to_scheme("W4A16_ASYM", ["Linear"])
    names = PackedQuantizationCompressor.compression_param_names(scheme)
    assert names == ("weight_packed", "weight_scale", "weight_shape",
                     "weight_zero_point")

    scheme = preset_name_to_scheme("NVFP4", ["Linear"])
    names = NVFP4PackedCompressor.compression_param_names(scheme)
    assert "weight_global_scale" in names
