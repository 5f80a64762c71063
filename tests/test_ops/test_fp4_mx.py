"""FP4 E2M1 rounding/packing and MX E8M0 scale math vs the torch reference."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "_stubs"))
from oracle import load_reference  # noqa: E402

from compressed_tensors_tpu.ops.fp4 import cast_to_fp4  # noqa: E402
from compressed_tensors_tpu.ops.fp4_pack import (  # noqa: E402
    pack_fp4_to_uint8,
    unpack_fp4_from_uint8,
)
from compressed_tensors_tpu.ops.mx import (  # noqa: E402
    compress_mx_scale,
    decompress_mx_scale,
    generate_mx_scales,
    round_to_power_2,
)


def test_cast_to_fp4_values():
    x = jnp.asarray(
        [0.0, 0.1, 0.25, 0.3, 0.5, 0.74, 0.75, 1.0, 1.25, 1.3, 1.5, 1.75,
         2.0, 2.5, 2.6, 3.0, 3.5, 4.0, 5.0, 5.1, 6.0, 100.0],
        dtype=jnp.float32,
    )
    expected = np.array(
        [0.0, 0.0, 0.0, 0.5, 0.5, 0.5, 1.0, 1.0, 1.0, 1.5, 1.5, 2.0,
         2.0, 2.0, 3.0, 3.0, 4.0, 4.0, 4.0, 6.0, 6.0, 6.0],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(np.asarray(cast_to_fp4(x)), expected)
    np.testing.assert_array_equal(np.asarray(cast_to_fp4(-x)), -expected)


def test_cast_to_fp4_matches_reference(rng):
    ref = load_reference()
    if ref is None:
        pytest.skip("reference oracle unavailable")
    import torch
    from compressed_tensors.quantization.utils.fp4_utils import cast_to_fp4 as ref_cast

    x = (rng.normal(size=(64, 64)) * 4).astype(np.float32)
    ours = np.asarray(cast_to_fp4(jnp.asarray(x)))
    theirs = ref_cast(torch.tensor(x)).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_fp4_pack_roundtrip(rng):
    x = cast_to_fp4(jnp.asarray((rng.normal(size=(16, 32)) * 3).astype(np.float32)))
    packed = pack_fp4_to_uint8(x)
    assert packed.dtype == jnp.uint8
    assert packed.shape == (16, 16)
    out = unpack_fp4_from_uint8(packed, 16, 32, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_fp4_pack_matches_reference(rng):
    ref = load_reference()
    if ref is None:
        pytest.skip("reference oracle unavailable")
    import torch
    from compressed_tensors.compressors.nvfp4.helpers import (
        pack_fp4_to_uint8 as ref_pack,
    )

    x = np.asarray(
        cast_to_fp4(jnp.asarray((rng.normal(size=(8, 64)) * 3).astype(np.float32)))
    )
    ours = np.asarray(pack_fp4_to_uint8(jnp.asarray(x)))
    theirs = ref_pack(torch.tensor(x)).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_e8m0_roundtrip():
    scales = jnp.asarray([2.0**-10, 0.5, 1.0, 2.0, 1024.0], dtype=jnp.float32)
    enc = compress_mx_scale(scales)
    assert enc.dtype == jnp.uint8
    dec = decompress_mx_scale(enc)
    np.testing.assert_allclose(np.asarray(dec, dtype=np.float32),
                               np.asarray(scales))


def test_round_to_power_2_matches_reference(rng):
    ref = load_reference()
    if ref is None:
        pytest.skip("reference oracle unavailable")
    import torch
    from compressed_tensors.quantization.utils.mxfp_utils import (
        round_to_power_2 as ref_round,
        generate_mx_scales as ref_gen,
    )

    x = np.abs(rng.normal(size=(256,))).astype(np.float32) * 10 + 1e-4
    ours = np.asarray(round_to_power_2(jnp.asarray(x)))
    theirs = ref_round(torch.tensor(x)).numpy()
    np.testing.assert_array_equal(ours, theirs)

    for bits in (4, 8):
        ours_s = np.asarray(generate_mx_scales(jnp.asarray(x), num_bits=bits))
        theirs_s = ref_gen(torch.tensor(x), num_bits=bits).numpy()
        np.testing.assert_array_equal(ours_s, theirs_s)
