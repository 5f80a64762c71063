"""MX/FP4 golden corpus — reference cases missing from the earlier MX
corpus (ref tests/test_quantization/test_utils/test_mxfp4_utils.py
round_to_power_2 goldens + noise immunity + MXFP4 e2e exponent identity;
ref tests/test_compressors/test_fp4_quant.py pack/unpack incl. odd
columns)."""

import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from compressed_tensors_tpu.ops.fp4_pack import (
    pack_fp4_to_uint8,
    unpack_fp4_from_uint8,
)
from compressed_tensors_tpu.ops.mx import (
    generate_mx_scales,
    maybe_convert_from_mx_exp,
    round_to_power_2,
)
from compressed_tensors_tpu.quantization import QuantizationArgs
from compressed_tensors_tpu.quantization.quant_args import (
    round_to_quantized_type_dtype,
)


def test_round_power_2():
    """Exact bf16 goldens (ref test_round_power_2): round DOWN to the
    nearest power of two, sign preserved."""
    x = np.array(
        [[5.687891, -8.291567, -1.540329, -0.315635, 0.965272],
         [-6.944130, 0.073246, -0.451778, 8.571118, -9.856593],
         [-0.040571, -0.708509, 2.485657, -4.003352, -0.995600],
         [0.224199, 5.032586, -1.309816, -0.621958, 7.290238],
         [-9.848001, -0.290731, 1.501562, 0.379829, -5.312081]],
        dtype=np.float32).astype(ml_dtypes.bfloat16)
    expected = np.array(
        [[4.0, -8.0, -1.0, -0.25, 1.0],
         [-4.0, 0.0625, -0.5, 8.0, -8.0],
         [-0.0312, -0.5, 2.0, -4.0, -1.0],
         [0.25, 4.0, -1.0, -0.5, 8.0],
         [-8.0, -0.25, 1.0, 0.25, -4.0]],
        dtype=np.float32).astype(ml_dtypes.bfloat16)
    rounded = round_to_power_2(jnp.asarray(x, jnp.bfloat16))
    np.testing.assert_array_equal(
        np.asarray(rounded).astype(np.float32),
        expected.astype(np.float32))


def test_round_power_2_noise(rng):
    """Powers of two survive up to +20% multiplicative noise
    (ref test_round_power_2_noise)."""
    powers = np.array(
        [[2**-10, 2**-9, 2**-8, 2**-7, 2**-6],
         [2**-5, 2**-4, 2**-3, 2**-2, 2**-1],
         [2**0, 2**1, 2**-10, 2**-9, 2**-8],
         [2**-7, 2**-6, 2**-5, 2**-4, 2**-3],
         [2**-2, 2**-1, 2**0, 2**1, 2**-10]],
        dtype=np.float32).astype(ml_dtypes.bfloat16).astype(np.float32)
    noisy = powers * (1 + rng.random(powers.shape).astype(np.float32) * 0.2)
    rounded = round_to_power_2(jnp.asarray(noisy, jnp.bfloat16))
    np.testing.assert_array_equal(
        np.asarray(rounded).astype(np.float32), powers)


@pytest.mark.parametrize("dtype", ["bfloat16", "float32"])
def test_mxfp4_scales_e2e(dtype, rng):
    """MXFP4 E8M0 exponent identity: offset is 2 (floor(log2(6)))
    instead of MXFP8's 8 (ref test_mxfp4_scales_e2e)."""
    from compressed_tensors_tpu.utils.dtypes import parse_dtype

    w = rng.normal(0.0002, 0.0576, size=(96, 96)).astype(np.float32)
    x = jnp.asarray(w, dtype=parse_dtype(dtype)).reshape(96, -1, 32)
    block_max = jnp.maximum(
        jnp.abs(jnp.minimum(jnp.min(x, -1), 0)),
        jnp.abs(jnp.maximum(jnp.max(x, -1), 0)))

    args = QuantizationArgs(num_bits=4, type="float", strategy="group",
                            group_size=32, scale_dtype=np.dtype(np.uint8),
                            zp_dtype=np.dtype(np.uint8))
    scales = generate_mx_scales(block_max, num_bits=4)
    scales = round_to_quantized_type_dtype(scales, dtype=args.scale_dtype)
    converted = maybe_convert_from_mx_exp(args=args, scale=scales)

    scales_exp = np.log2(np.asarray(converted, np.float64))
    p2 = np.asarray(round_to_power_2(block_max.astype(jnp.float32)),
                    np.float64)
    np.testing.assert_array_equal(scales_exp, np.floor(np.log2(p2)) - 2)


FP4_VALUES = [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
              -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0]


def test_fp4_pack_unpack(rng):
    """Every representable E2M1 value round-trips through the nibble
    packing (ref test_fp4_quant.py test_pack_unpack)."""
    vals = rng.choice(FP4_VALUES, size=(16, 32)).astype(np.float32)
    packed = pack_fp4_to_uint8(jnp.asarray(vals))
    assert packed.dtype == jnp.uint8
    assert packed.shape == (16, 16)
    unpacked = unpack_fp4_from_uint8(packed, 16, 32, dtype=jnp.float32)
    # -0.0 decodes as +0.0; compare with signed-zero-insensitive equality
    np.testing.assert_array_equal(np.asarray(unpacked) + 0.0, vals + 0.0)


def test_fp4_pack_unpack_odd_dims(rng):
    """Odd column counts are rejected, matching the reference
    (ref test_pack_unpack_odd_dims expects a raise — two values per
    byte is part of the on-disk format)."""
    vals = rng.choice(FP4_VALUES, size=(3, 7)).astype(np.float32)
    with pytest.raises(ValueError):
        pack_fp4_to_uint8(jnp.asarray(vals))
