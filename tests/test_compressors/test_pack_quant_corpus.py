"""Pack-quantized codec corpus, ported from the reference's
tests/test_compressors/test_pack_quant.py: every bit width (1-8),
non-divisible shapes, known-value repacks, actorder round trips,
asymmetric zero-point decompression, packed-zp consistency, 3D (MoE)
slice-wise packing."""

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.compressors import get_compressor
from compressed_tensors_tpu.ops import calculate_qparams, fake_quantize
from compressed_tensors_tpu.ops.pack import (
    pack_to_int32,
    packed_cols,
    unpack_from_int32,
)
from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationScheme,
)


@pytest.mark.parametrize("value", [
    np.array([[1, 2], [3, 4]]),
    np.array([[1, 2, 3, 4, 5, 6, 7, 0],
              [-1, -2, -3, -4, -5, -6, -7, -8]]),
    None,  # random (32, 100) in [-8, 8)
])
def test_repack_4bit(value, rng):
    if value is None:
        value = (rng.random((32, 100)) * 16 - 8)
    value = value.astype(np.int8)
    assert not (value > 7).any() and not (value < -8).any()
    packed = pack_to_int32(jnp.asarray(value), 4)
    unpacked = unpack_from_int32(packed, 4, value.shape)
    np.testing.assert_array_equal(np.asarray(unpacked), value)


@pytest.mark.parametrize("value", [
    np.array([[30, 40], [50, 60]]),
    np.array([[10, 15, 20, 25, 30, 35, 40, 45],
              [-10, -20, -30, -40, -50, -60, -70, -80]]),
    None,  # random (32, 100) in [-128, 128)
])
def test_repack_8bit(value, rng):
    if value is None:
        value = (rng.random((32, 100)) * 256 - 128)
    value = value.astype(np.int8)
    packed = pack_to_int32(jnp.asarray(value), 8)
    unpacked = unpack_from_int32(packed, 8, value.shape)
    np.testing.assert_array_equal(np.asarray(unpacked), value)


@pytest.mark.parametrize("num_bits", [1, 2, 3, 4, 5, 6, 7, 8])
@pytest.mark.parametrize("shape", [(256, 1024), (512, 100), (128, 33)])
def test_pack_unpack_roundtrip(num_bits, shape, rng):
    """Every bit width over divisible AND non-divisible column counts
    (ref test_pack_unpack_roundtrip:145)."""
    lo, hi = -(1 << (num_bits - 1)), (1 << (num_bits - 1)) - 1
    value = rng.integers(lo, hi + 1, size=shape).astype(np.int8)
    packed = pack_to_int32(jnp.asarray(value), num_bits)
    assert packed.dtype == jnp.int32
    assert packed.shape == (shape[0], packed_cols(shape[1], num_bits))
    unpacked = unpack_from_int32(packed, num_bits, shape)
    np.testing.assert_array_equal(np.asarray(unpacked), value)


@pytest.mark.parametrize("num_bits", [1, 2, 3, 4, 5, 6, 7, 8])
def test_compress_decompress_match(num_bits, rng):
    """Full codec round trip equals fake-quantization for every bit width
    (ref test_compress_decompress_match:161)."""
    shape = (64, 256)
    w = rng.standard_normal(shape).astype(np.float32)
    args = QuantizationArgs(num_bits=num_bits, type="int", strategy="group",
                            group_size=64, symmetric=True)
    scheme = QuantizationScheme(targets=["Linear"], weights=args)
    g = w.reshape(shape[0], -1, 64)
    scale, zp = calculate_qparams(jnp.asarray(g.min(-1)),
                                  jnp.asarray(g.max(-1)), args)
    state = {"weight": jnp.asarray(w), "weight_scale": scale}

    compressor = get_compressor("pack-quantized")
    compressed = compressor.compress(dict(state), scheme)
    decompressed = compressor.decompress(dict(compressed), scheme)
    fq = fake_quantize(jnp.asarray(w), scale, None, args)
    np.testing.assert_allclose(np.asarray(decompressed["weight"], np.float32),
                               np.asarray(fq, np.float32), atol=1e-5)


@pytest.mark.parametrize("actorder", ["group", "weight", None])
def test_actorder_compress_decompress_match(actorder, rng):
    """g_idx (activation ordering) survives the codec round trip
    (ref test_actorder_compress_decompress_match:246)."""
    shape, group_size = (128, 512), 128
    w = rng.standard_normal(shape).astype(np.float32)
    args = QuantizationArgs(num_bits=4, type="int", strategy="group",
                            group_size=group_size, symmetric=True,
                            actorder=actorder)
    scheme = QuantizationScheme(targets=["Linear"], weights=args)
    g = w.reshape(shape[0], -1, group_size)
    scale, _ = calculate_qparams(jnp.asarray(g.min(-1)),
                                 jnp.asarray(g.max(-1)), args)
    state = {"weight": jnp.asarray(w), "weight_scale": scale}
    g_idx = None
    if actorder == "group":
        # dummy activation-ordering permutation: column -> group
        perm = rng.permutation(shape[1])
        g_idx = jnp.asarray((perm // group_size).astype(np.int32))
        state["weight_g_idx"] = g_idx

    compressor = get_compressor("pack-quantized")
    compressed = compressor.compress(dict(state), scheme)
    if actorder == "group":
        assert "weight_g_idx" in compressed
    decompressed = compressor.decompress(dict(compressed), scheme)
    fq = fake_quantize(jnp.asarray(w), scale, None, args, g_idx=g_idx)
    np.testing.assert_allclose(np.asarray(decompressed["weight"], np.float32),
                               np.asarray(fq, np.float32), atol=1e-5)


@pytest.mark.parametrize("strategy,group_size",
                         [("group", 128), ("channel", None)])
def test_asymmetric_zero_point_decompression(strategy, group_size, rng):
    """Asymmetric packed zero points: int32 on disk, restored shape on
    decompress (ref test_asymmetric_zero_point_decompression:287)."""
    shape = (512, 1024)
    zp_shape = ((shape[0], 1) if strategy == "channel"
                else (shape[0], shape[1] // group_size))
    state = {
        "weight": jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
        "weight_scale": jnp.asarray(
            rng.random(zp_shape).astype(np.float32) + 1e-3),
        "weight_zero_point": jnp.asarray(
            rng.integers(-8, 8, size=zp_shape).astype(np.int8)),
    }
    scheme = QuantizationScheme(
        targets=["Linear"],
        weights=QuantizationArgs(num_bits=4, strategy=strategy,
                                 symmetric=False, group_size=group_size))
    compressor = get_compressor("pack-quantized")
    compressed = compressor.compress(dict(state), scheme)
    assert "weight_zero_point" in compressed
    assert compressed["weight_zero_point"].dtype == jnp.int32
    decompressed = compressor.decompress(dict(compressed), scheme)
    assert decompressed["weight"].shape == shape


@pytest.mark.parametrize("num_bits,strategy", [
    (4, "group"), (4, "channel"), (8, "group"), (8, "channel")])
def test_zero_point_pack_unpack_consistency(num_bits, strategy, rng):
    shape = (512, 8) if strategy == "group" else (512, 1)
    hi = (1 << (num_bits - 1)) - 1
    zp = rng.integers(-hi - 1, hi + 1, size=shape).astype(np.int8)
    packed = pack_to_int32(jnp.asarray(zp), num_bits, packed_dim=0)
    unpacked = unpack_from_int32(packed, num_bits, shape, packed_dim=0)
    assert unpacked.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(unpacked), zp)


@pytest.mark.parametrize("num_bits", [1, 2, 3, 4, 5, 6, 7, 8])
def test_pack_unpack_3d_round_trip(num_bits, rng):
    """3D stacked-expert tensors pack slice-wise
    (ref test_pack_unpack_3d_round_trip:347)."""
    shape = (4, 32, 96)
    lo, hi = -(1 << (num_bits - 1)), (1 << (num_bits - 1)) - 1
    value = rng.integers(lo, hi + 1, size=shape).astype(np.int8)
    packed = pack_to_int32(jnp.asarray(value), num_bits)
    unpacked = unpack_from_int32(packed, num_bits, shape[-2:])
    np.testing.assert_array_equal(np.asarray(unpacked), value)


@pytest.mark.parametrize("num_bits", [1, 2, 3, 4, 5, 6, 7, 8])
def test_pack_unpack_3d_matches_stacked_2d(num_bits, rng):
    """3D packing == stacking the per-slice 2D packs
    (ref test_pack_unpack_3d_matches_stacked_2d:358)."""
    shape = (3, 16, 64)
    lo, hi = -(1 << (num_bits - 1)), (1 << (num_bits - 1)) - 1
    value = rng.integers(lo, hi + 1, size=shape).astype(np.int8)
    packed_3d = np.asarray(pack_to_int32(jnp.asarray(value), num_bits))
    packed_2d = np.stack([
        np.asarray(pack_to_int32(jnp.asarray(value[i]), num_bits))
        for i in range(shape[0])
    ])
    np.testing.assert_array_equal(packed_3d, packed_2d)
