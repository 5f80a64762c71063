"""MX-format codec corpus, ported from the reference's
tests/test_compressors/{test_mxfp4_quant,test_mxfp8_quant,
test_fp4_quant}.py: E8M0 scale encode/decode losslessness, scale-dtype
handling, can_compress gating, fp4 nibble pack/unpack odd dims."""

import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from compressed_tensors_tpu.compressors import get_compressor
from compressed_tensors_tpu.compressors.nvfp4 import (
    MXFP4PackedCompressor,
    MXFP8QuantizationCompressor,
    NVFP4PackedCompressor,
)
from compressed_tensors_tpu.ops import calculate_qparams
from compressed_tensors_tpu.ops.fp4_pack import (
    pack_fp4_to_uint8,
    unpack_fp4_from_uint8,
)
from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationScheme,
)


def _mx_args(num_bits):
    return QuantizationArgs(num_bits=num_bits, type="float",
                            strategy="group", group_size=32,
                            scale_dtype="uint8", zp_dtype="uint8",
                            symmetric=True)


def _mx_state(rng, args, rows=128, cols=256):
    w = rng.standard_normal((rows, cols)).astype(np.float32)
    g = w.reshape(rows, -1, args.group_size)
    scale, zp = calculate_qparams(jnp.asarray(g.min(-1)),
                                  jnp.asarray(g.max(-1)), args)
    return w, {"weight": jnp.asarray(w), "weight_scale": scale}


def test_mxfp8_compress_decompress(rng):
    """Round trip: fp8 weight + uint8 E8M0 scales, lossy-but-close
    (ref test_mxfp8_compress_decompress:14)."""
    args = _mx_args(8)
    scheme = QuantizationScheme(targets=["Linear"], weights=args)
    w, state = _mx_state(rng, args, 512, 1024)

    compressed = MXFP8QuantizationCompressor.compress(dict(state), scheme)
    assert compressed["weight"].dtype == jnp.dtype(ml_dtypes.float8_e4m3fn)
    assert compressed["weight_scale"].dtype == jnp.uint8

    decompressed = MXFP8QuantizationCompressor.decompress(dict(compressed),
                                                          scheme)
    out = np.asarray(decompressed["weight"], np.float32)
    assert out.shape == w.shape
    np.testing.assert_allclose(out, w, atol=0.35, rtol=0.35)


def test_mxfp8_scale_roundtrip(rng):
    """E8M0 encode/decode is lossless for the power-of-2 scales the MX
    path generates: decoded == 2^floor(log2(scale))
    (ref test_mxfp8_scale_roundtrip:72)."""
    args = _mx_args(8)
    scheme = QuantizationScheme(targets=["Linear"], weights=args)
    w, state = _mx_state(rng, args)
    orig_scale = np.asarray(state["weight_scale"], np.float32)

    compressed = MXFP8QuantizationCompressor.compress(dict(state), scheme)
    e8m0 = np.asarray(compressed["weight_scale"])
    assert e8m0.dtype == np.uint8
    decoded = 2.0 ** (e8m0.astype(np.int32) - 127)
    expected = 2.0 ** np.floor(np.log2(orig_scale))
    np.testing.assert_allclose(decoded, expected)


def test_mx_can_compress_gating():
    """can_compress: MXFP8 takes fp8 group-32 uint8-scale schemes; MXFP4
    takes fp4 group-32; NVFP4 takes fp4 group-16 (ref test_mxfp8_quant.py
    test_mxfp8_can_compress + nvfp4/base.py:129-138)."""
    mx8 = QuantizationScheme(targets=["Linear"], weights=_mx_args(8))
    mx4 = QuantizationScheme(targets=["Linear"], weights=_mx_args(4))
    nv4 = QuantizationScheme(
        targets=["Linear"],
        weights=QuantizationArgs(num_bits=4, type="float",
                                 strategy="tensor_group", group_size=16))
    assert MXFP8QuantizationCompressor.can_compress("Linear", mx8)
    assert not MXFP8QuantizationCompressor.can_compress("Linear", mx4)
    assert MXFP4PackedCompressor.can_compress("Linear", mx4)
    assert not MXFP4PackedCompressor.can_compress("Linear", nv4)
    assert NVFP4PackedCompressor.can_compress("Linear", nv4)


def test_mxfp4_decompress_decodes_mx_scales(rng):
    """MXFP4 decompression decodes E8M0 scales and restores the weight
    shape (ref test_mxfp4_quant.py:60)."""
    args = _mx_args(4)
    scheme = QuantizationScheme(targets=["Linear"], weights=args)
    w, state = _mx_state(rng, args, 64, 128)
    compressor = get_compressor("mxfp4-pack-quantized")
    compressed = compressor.compress(dict(state), scheme)
    assert compressed["weight_packed"].dtype == jnp.uint8
    assert compressed["weight_scale"].dtype == jnp.uint8
    decompressed = compressor.decompress(dict(compressed), scheme)
    out = np.asarray(decompressed["weight"], np.float32)
    assert out.shape == w.shape
    assert np.isfinite(out).all()


def test_fp4_pack_unpack(rng):
    """Nibble packing round trip on the fp4 value set
    (ref test_fp4_quant.py::test_pack_unpack)."""
    vals = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
                     -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0, 0.0],
                    np.float32).reshape(2, 8)
    packed = pack_fp4_to_uint8(jnp.asarray(vals))
    assert packed.dtype == jnp.uint8
    assert packed.shape == (2, 4)
    unpacked = unpack_fp4_from_uint8(packed, 2, 8, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(unpacked), vals)


def test_fp4_pack_unpack_odd_dims(rng):
    """Odd trailing dims still round trip through padding
    (ref test_fp4_quant.py::test_pack_unpack_odd_dims)."""
    fp4_set = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
                        -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0],
                       np.float32)
    vals = rng.choice(fp4_set, size=(5, 6)).astype(np.float32)
    packed = pack_fp4_to_uint8(jnp.asarray(vals))
    unpacked = unpack_fp4_from_uint8(packed, 5, 6, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(unpacked), vals)
