"""Native C++ IO/codec library: codec equivalence with the jnp
implementation and parallel file reads."""

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.ops.pack import pack_to_int32, unpack_from_int32
from compressed_tensors_tpu.utils.native import (
    native_available,
    pack_int32_native,
    read_range_parallel,
    unpack_int32_native,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@needs_native
@pytest.mark.parametrize("num_bits", [1, 3, 4, 5, 8])
def test_native_pack_matches_jnp(num_bits, rng):
    lo, hi = -(1 << (num_bits - 1)), (1 << (num_bits - 1))
    vals = rng.integers(lo, hi, size=(16, 100), dtype=np.int8)

    native_packed = pack_int32_native(vals, num_bits)
    jnp_packed = np.asarray(pack_to_int32(jnp.asarray(vals), num_bits))
    np.testing.assert_array_equal(native_packed, jnp_packed)

    native_unpacked = unpack_int32_native(jnp_packed, num_bits, 100)
    np.testing.assert_array_equal(native_unpacked, vals)

    jnp_unpacked = np.asarray(
        unpack_from_int32(jnp.asarray(native_packed), num_bits, (16, 100))
    )
    np.testing.assert_array_equal(jnp_unpacked, vals)


@needs_native
def test_parallel_read(tmp_path, rng):
    data = rng.integers(0, 256, size=(1 << 20,)).astype(np.uint8)
    path = tmp_path / "blob.bin"
    path.write_bytes(data.tobytes())

    out = read_range_parallel(str(path), 0, len(data), num_threads=4)
    np.testing.assert_array_equal(out, data)

    # offset read
    out = read_range_parallel(str(path), 1000, 5000, num_threads=2)
    np.testing.assert_array_equal(out, data[1000:6000])


@needs_native
def test_read_missing_file():
    assert read_range_parallel("/nonexistent/file", 0, 10) is None
