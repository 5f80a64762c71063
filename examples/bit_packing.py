"""Dense int32 bit-packing example (the analogue of reference
examples/bit_packing): pack 1-8 bit values with zero wasted bits.

Run: python examples/bit_packing.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from compressed_tensors_tpu.ops.pack import (  # noqa: E402
    pack_to_int32,
    packed_cols,
    unpack_from_int32,
)


def main():
    rng = np.random.default_rng(0)
    for bits in (2, 3, 4, 8):
        vals = rng.integers(-(1 << (bits - 1)), 1 << (bits - 1),
                            size=(4, 96), dtype=np.int8)
        packed = pack_to_int32(jnp.asarray(vals), bits)
        restored = unpack_from_int32(packed, bits, vals.shape)
        assert np.array_equal(np.asarray(restored), vals)
        ratio = vals.size / (packed.size * 4)
        print(f"{bits}-bit: {vals.shape} int8 -> "
              f"{packed.shape} int32 ({packed_cols(96, bits)} words/row, "
              f"{ratio:.2f} elems/byte)")


if __name__ == "__main__":
    main()
