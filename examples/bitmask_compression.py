"""Sparse bitmask compression example — the analogue of the reference's
examples/bitmask_compression.ipynb: build a 2:4-pruned weight, compress it
to the sparse-24-bitmask format, show the size win, decompress and verify.

Run: python examples/bitmask_compression.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from compressed_tensors_tpu.ops.bitmask import (  # noqa: E402
    bitmask_compress,
    bitmask_decompress,
    sparse24_compress,
    sparse24_decompress,
)


def prune_2_4(w: np.ndarray) -> np.ndarray:
    """Keep the 2 largest-magnitude values in every group of 4."""
    groups = w.reshape(-1, 4)
    idx = np.argsort(np.abs(groups), axis=1)[:, :2]
    out = groups.copy()
    np.put_along_axis(out, idx, 0.0, axis=1)
    return out.reshape(w.shape)


def nbytes(*arrays) -> int:
    return sum(np.asarray(a).nbytes for a in arrays)


def main():
    rng = np.random.default_rng(0)
    w = prune_2_4(rng.standard_normal((1024, 1024)).astype(np.float32))
    dense_bytes = w.nbytes

    # generic unstructured bitmask (ref utils/helpers.py:306-345 format)
    values, bitmask, row_offsets = bitmask_compress(jnp.asarray(w))
    print(f"dense:            {dense_bytes/1e6:7.3f} MB")
    print(f"sparse-bitmask:   {nbytes(values, bitmask, row_offsets)/1e6:7.3f} MB "
          f"({dense_bytes / nbytes(values, bitmask, row_offsets):.2f}x smaller)")
    restored = bitmask_decompress(values, bitmask, w.shape)
    np.testing.assert_array_equal(np.asarray(restored), w)

    # 2:4 structured variant (BASELINE config 4's serialized format)
    values24, bitmask24 = sparse24_compress(jnp.asarray(w))
    print(f"sparse-24-bitmask:{nbytes(values24, bitmask24)/1e6:7.3f} MB "
          f"({dense_bytes / nbytes(values24, bitmask24):.2f}x smaller)")
    restored24 = sparse24_decompress(values24, bitmask24, w.shape)
    np.testing.assert_array_equal(np.asarray(restored24), w)
    print("round trips exact")


if __name__ == "__main__":
    main()
