"""Bitmask + 2:4 sparse codec tests (these formats are first-class here even
though the reference demoted them; layout must match numpy little-endian
packbits, ref utils/helpers.py:306-345)."""

import jax.numpy as jnp
import numpy as np

from compressed_tensors_tpu.ops.bitmask import (
    bitmask_compress,
    bitmask_decompress,
    get_24_bytemasks,
    pack_bitmasks,
    sparse24_compress,
    sparse24_decompress,
    tensor_follows_mask_structure,
    unpack_bitmasks,
)


def test_pack_bitmasks_matches_numpy(rng):
    mask = rng.random((13, 37)) > 0.5
    ours = np.asarray(pack_bitmasks(jnp.asarray(mask)))
    theirs = np.packbits(mask, axis=-1, bitorder="little")
    np.testing.assert_array_equal(ours, theirs)

    back = np.asarray(unpack_bitmasks(jnp.asarray(ours), (13, 37)))
    np.testing.assert_array_equal(back, mask)


def test_sparse24_roundtrip(rng):
    w = rng.normal(size=(16, 64)).astype(np.float32)
    mask = np.asarray(get_24_bytemasks(jnp.asarray(w)))
    assert mask.reshape(-1, 4).sum(-1).max() == 2
    compressed, bitmask = sparse24_compress(jnp.asarray(w))
    assert compressed.shape == (16, 32)
    dense = np.asarray(sparse24_decompress(compressed, bitmask, (16, 64)))
    np.testing.assert_array_equal(dense, w * mask)
    assert tensor_follows_mask_structure(jnp.asarray(dense), "2:4")


def test_sparse24_roundtrip_on_sparse_input(rng):
    """A tensor that already follows 2:4 must round-trip exactly."""
    w = rng.normal(size=(8, 32)).astype(np.float32)
    mask = np.asarray(get_24_bytemasks(jnp.asarray(w)))
    w = w * mask
    compressed, bitmask = sparse24_compress(jnp.asarray(w))
    dense = np.asarray(sparse24_decompress(compressed, bitmask, (8, 32)))
    np.testing.assert_array_equal(dense, w)


def test_unstructured_bitmask_roundtrip(rng):
    w = rng.normal(size=(9, 41)).astype(np.float32)
    w[rng.random(w.shape) < 0.7] = 0.0
    values, bitmask, row_offsets = bitmask_compress(jnp.asarray(w))
    assert values.shape[0] == int((w != 0).sum())
    dense = np.asarray(bitmask_decompress(values, bitmask, (9, 41)))
    np.testing.assert_array_equal(dense, w)
