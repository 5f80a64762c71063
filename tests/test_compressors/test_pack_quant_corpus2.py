"""Pack-quantized corpus, second sweep — the reference cases missing from
the first corpus (ref tests/test_compressors/test_pack_quant.py:77
test_quant_format, :372 non-divisible round trips, :388/:408 old
element-aligned-packing compatibility). The old-pack tests pin BIT-EXACT
compatibility with checkpoints written by pre-cross-boundary packers."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.compressors import PackedQuantizationCompressor
from compressed_tensors_tpu.ops.pack import pack_to_int32, unpack_from_int32
from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationScheme,
)


def _old_pack_to_int32(value: np.ndarray, num_bits: int) -> np.ndarray:
    """The pre-cross-boundary element-aligned packer: pack_factor =
    32 // num_bits whole elements per word, columns padded up
    (ref test_pack_quant.py's _old_pack_to_int32)."""
    pack_factor = 32 // num_bits
    offset = 1 << (num_bits - 1)
    v = (value.astype(np.int32) + offset).astype(np.uint32)
    rows, cols = v.shape
    padded = math.ceil(cols / pack_factor) * pack_factor
    if padded > cols:
        v = np.pad(v, ((0, 0), (0, padded - cols)))
    out = np.zeros((rows, padded // pack_factor), dtype=np.uint32)
    for i in range(pack_factor):
        out |= v[:, i::pack_factor] << np.uint32(i * num_bits)
    return out.view(np.int32)


@pytest.mark.parametrize("shape", [(512, 1024), (830, 545), (342, 512),
                                   (256, 700)])
def test_quant_format(shape, rng):
    """Compression replaces weight with weight_packed + weight_shape and
    strips the symmetric zero point (ref :77)."""
    state = {
        "weight": jnp.asarray(rng.random(shape).astype(np.float32)),
        "weight_scale": jnp.asarray(0.01, jnp.float32).reshape(1),
        "weight_zero_point": jnp.zeros((1,), jnp.int8),
    }
    scheme = QuantizationScheme(
        targets=["Linear"],
        weights=QuantizationArgs(num_bits=4, symmetric=True),
    )
    compressed = PackedQuantizationCompressor.compress(state, scheme=scheme)

    assert "weight" not in compressed
    assert "weight_packed" in compressed
    assert "weight_shape" in compressed
    assert "weight_zero_point" not in compressed
    assert compressed["weight_packed"].dtype == jnp.int32
    assert compressed["weight_packed"].shape == (
        shape[0], math.ceil(shape[1] * 4 / 32))
    np.testing.assert_array_equal(np.asarray(compressed["weight_shape"]),
                                  np.asarray(shape))
    assert compressed["weight_scale"].dtype == jnp.float32


@pytest.mark.parametrize("num_bits", [1, 2, 3, 4, 5, 6, 7, 8])
@pytest.mark.parametrize("k", [33, 64, 100, 1024])
def test_pack_unpack_round_trip_nondivisible(num_bits, k, rng):
    """Every bit width round-trips at non-divisible column counts
    (cross-word-boundary packing, ref :372)."""
    shape = (64, k)
    lo, hi = -(1 << (num_bits - 1)), (1 << (num_bits - 1)) - 1
    value = rng.integers(lo, hi + 1, size=shape).astype(np.int8)

    packed = pack_to_int32(jnp.asarray(value), num_bits)
    assert packed.dtype == jnp.int32
    assert packed.shape == (shape[0], math.ceil(shape[1] * num_bits / 32))

    unpacked = unpack_from_int32(packed, num_bits, shape)
    np.testing.assert_array_equal(np.asarray(unpacked), value)


@pytest.mark.parametrize("num_bits", [1, 2, 4, 8])
@pytest.mark.parametrize("k", [33, 64, 100, 1024])
def test_old_pack_new_unpack_roundtrip(num_bits, k, rng):
    """Checkpoints packed by the old element-aligned code unpack exactly
    (power-of-2 widths; ref :388)."""
    shape = (64, k)
    lo, hi = -(1 << (num_bits - 1)), (1 << (num_bits - 1)) - 1
    value = rng.integers(lo, hi + 1, size=shape).astype(np.int8)
    old_packed = _old_pack_to_int32(value, num_bits)
    unpacked = unpack_from_int32(jnp.asarray(old_packed), num_bits, shape)
    np.testing.assert_array_equal(np.asarray(unpacked), value)


@pytest.mark.parametrize("num_bits", [1, 2, 4, 8])
@pytest.mark.parametrize("k", [33, 64, 100, 1024])
def test_power_of_2_bits_same_packed_output_as_old(num_bits, k, rng):
    """For power-of-2 widths the dense packer's bytes are IDENTICAL to the
    old packer's — existing checkpoints neither misload nor need a repack
    (ref :408)."""
    shape = (64, k)
    lo, hi = -(1 << (num_bits - 1)), (1 << (num_bits - 1)) - 1
    value = rng.integers(lo, hi + 1, size=shape).astype(np.int8)
    np.testing.assert_array_equal(
        np.asarray(pack_to_int32(jnp.asarray(value), num_bits)),
        _old_pack_to_int32(value, num_bits))
