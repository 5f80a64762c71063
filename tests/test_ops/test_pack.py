"""int32 dense-packing codec tests: round trips for every bit width, 3D MoE
tensors, packed_dim 0/1, and bit-exactness against the torch reference
(mirrors the coverage of reference tests/test_compressors/.../test_pack_quant.py).
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "_stubs"))
from oracle import load_reference  # noqa: E402

from compressed_tensors_tpu.ops.pack import (  # noqa: E402
    pack_to_int32,
    packed_cols,
    unpack_from_int32,
)


@pytest.mark.parametrize("num_bits", list(range(1, 9)))
@pytest.mark.parametrize("shape", [(4, 32), (7, 67), (16, 128), (1, 3)])
def test_roundtrip(num_bits, shape, rng):
    lo, hi = -(1 << (num_bits - 1)), (1 << (num_bits - 1))
    vals = rng.integers(lo, hi, size=shape, dtype=np.int8)
    packed = pack_to_int32(jnp.asarray(vals), num_bits)
    assert packed.dtype == jnp.int32
    assert packed.shape == (shape[0], packed_cols(shape[1], num_bits))
    out = unpack_from_int32(packed, num_bits, shape)
    assert np.array_equal(np.asarray(out), vals)


@pytest.mark.parametrize("num_bits", [3, 4, 8])
def test_roundtrip_packed_dim0(num_bits, rng):
    lo, hi = -(1 << (num_bits - 1)), (1 << (num_bits - 1))
    vals = rng.integers(lo, hi, size=(33, 9), dtype=np.int8)
    packed = pack_to_int32(jnp.asarray(vals), num_bits, packed_dim=0)
    assert packed.shape == (packed_cols(33, num_bits), 9)
    out = unpack_from_int32(packed, num_bits, (33, 9), packed_dim=0)
    assert np.array_equal(np.asarray(out), vals)


@pytest.mark.parametrize("num_bits", [4, 5])
def test_roundtrip_3d_moe(num_bits, rng):
    lo, hi = -(1 << (num_bits - 1)), (1 << (num_bits - 1))
    vals = rng.integers(lo, hi, size=(3, 8, 64), dtype=np.int8)
    packed = pack_to_int32(jnp.asarray(vals), num_bits)
    assert packed.shape == (3, 8, packed_cols(64, num_bits))
    out = unpack_from_int32(packed, num_bits, (3, 8, 64))
    assert np.array_equal(np.asarray(out), vals)


@pytest.mark.parametrize("num_bits", list(range(1, 9)))
def test_bit_exact_vs_reference(num_bits, rng):
    """The packed int32 words must match the reference bit-for-bit or
    existing checkpoints would misload."""
    ref = load_reference()
    if ref is None:
        pytest.skip("reference oracle unavailable")
    import torch
    from compressed_tensors.compressors.pack_quantized.helpers import (
        pack_to_int32 as ref_pack,
        unpack_from_int32 as ref_unpack,
    )

    lo, hi = -(1 << (num_bits - 1)), (1 << (num_bits - 1))
    vals = rng.integers(lo, hi, size=(5, 77), dtype=np.int8)

    ours = np.asarray(pack_to_int32(jnp.asarray(vals), num_bits))
    theirs = ref_pack(torch.tensor(vals), num_bits).numpy()
    assert np.array_equal(ours, theirs)

    # and our unpack reads their packed output
    out = unpack_from_int32(jnp.asarray(theirs), num_bits, (5, 77))
    assert np.array_equal(np.asarray(out), vals)

    # packed_dim=0 (zero-point packing path)
    ours0 = np.asarray(pack_to_int32(jnp.asarray(vals), num_bits, packed_dim=0))
    theirs0 = ref_pack(torch.tensor(vals), num_bits, packed_dim=0).numpy()
    assert np.array_equal(ours0, theirs0)
    out0 = ref_unpack(torch.tensor(ours0), num_bits, torch.Size((5, 77)),
                      packed_dim=0).numpy()
    assert np.array_equal(out0, vals)
