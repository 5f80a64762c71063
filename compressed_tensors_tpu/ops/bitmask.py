"""Bitmask + 2:4 structured-sparse codecs.

The reference demoted these to legacy (`config/base.py` marks sparse-bitmask /
sparse-24-bitmask legacy; impls removed) but the serialized format is still
consumed downstream and is required by BASELINE config 4, so they are
first-class here.

Format (matching the historical compressed-tensors layout and the reference's
surviving helpers `utils/helpers.py:306-345`):
- ``bitmask``: uint8, shape (R, ceil(C/8)), little-endian bit order along
  the last axis (bit k of byte j = column j*8+k nonzero).
- sparse-bitmask (unstructured): ``compressed`` 1-D nonzero values row-major,
  ``row_offsets`` int64 per-row start indices, ``shape``.
- sparse-24-bitmask (2:4): ``compressed`` dense (R, C/2) values (exactly two
  nonzeros per group of four), ``shape``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pack_bitmasks",
    "unpack_bitmasks",
    "get_24_bytemasks",
    "sparse24_compress",
    "sparse24_decompress",
    "bitmask_compress",
    "bitmask_decompress",
    "tensor_follows_mask_structure",
]

_BIT_WEIGHTS = np.array([1, 2, 4, 8, 16, 32, 64, 128], dtype=np.uint8)


@partial(jax.jit)
def pack_bitmasks(bytemasks: jnp.ndarray) -> jnp.ndarray:
    """(R, C) bool -> (R, ceil(C/8)) uint8, little-endian bit order
    (matches numpy.packbits(..., bitorder="little"), ref helpers.py:306-317).
    """
    rows, cols = bytemasks.shape
    pad = (-cols) % 8
    m = bytemasks.astype(jnp.uint8)
    if pad:
        m = jnp.pad(m, ((0, 0), (0, pad)))
    m = m.reshape(rows, -1, 8)
    return jnp.sum(m * jnp.asarray(_BIT_WEIGHTS), axis=-1).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("original_shape",))
def unpack_bitmasks(
    packed: jnp.ndarray, original_shape: tuple[int, ...]
) -> jnp.ndarray:
    """(R, ceil(C/8)) uint8 -> (R, C) bool (ref helpers.py:320-344)."""
    rows, cols = original_shape
    bits = (packed[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
    bits = bits.reshape(rows, -1)[:, :cols]
    return bits.astype(jnp.bool_)


@partial(jax.jit)
def get_24_bytemasks(tensor: jnp.ndarray) -> jnp.ndarray:
    """2:4 mask: keep the top-2 magnitudes in each contiguous group of 4
    (matches the reference's semi-structured mask_creator semantics)."""
    shape = tensor.shape
    flat = tensor.reshape(-1, 4)
    mag = jnp.abs(flat.astype(jnp.float32))
    # rank within each group; keep the two largest (ties -> lower index kept,
    # matching topk behavior)
    order = jnp.argsort(-mag, axis=-1, stable=True)
    mask = jnp.zeros_like(mag, dtype=jnp.bool_)
    rows = jnp.arange(flat.shape[0])
    mask = mask.at[rows, order[:, 0]].set(True)
    mask = mask.at[rows, order[:, 1]].set(True)
    return mask.reshape(shape)


def tensor_follows_mask_structure(tensor: jnp.ndarray, mask: str = "2:4") -> bool:
    """True if each group of `m` has at most `n` nonzeros (ref helpers.py:87)."""
    n, m = (int(v) for v in mask.split(":"))
    flat = (tensor != 0).reshape(-1, m)
    return bool(jnp.all(jnp.sum(flat, axis=-1) <= n))


def _sparse24_compress_block(weight: jnp.ndarray):
    rows, cols = weight.shape
    mask = get_24_bytemasks(weight)
    values = jnp.where(mask, weight, 0)
    # gather the two kept values per group of 4, preserving order
    flat_v = values.reshape(-1, 4)
    flat_m = mask.reshape(-1, 4)
    # stable sort by (not kept) pushes kept values (in order) to the front
    order = jnp.argsort(~flat_m, axis=-1, stable=True)
    kept = jnp.take_along_axis(flat_v, order[:, :2], axis=-1)
    compressed = kept.reshape(rows, cols // 2)
    bitmask = pack_bitmasks(mask)
    return compressed, bitmask


@jax.jit
def sparse24_compress(weight: jnp.ndarray):
    """Compress a 2:4-sparse weight into (compressed (R, C/2), bitmask).

    The weight must already follow the 2:4 structure (or is projected onto
    it by magnitude). Row-blocked like sparse24_decompress: the
    group-of-4-minor temporaries pad ~32x on TPU lanes, which at 8B weight
    shapes materializes multi-GB intermediates."""
    rows, cols = weight.shape
    block = max(8, min(rows, (2 << 20) // max(cols, 1)))
    nb = -(-rows // block)
    if nb <= 1:
        return _sparse24_compress_block(weight)
    pad_rows = nb * block - rows
    w = jnp.pad(weight, ((0, pad_rows), (0, 0)))
    comp, bm = jax.lax.map(
        _sparse24_compress_block, w.reshape(nb, block, cols))
    return (comp.reshape(nb * block, cols // 2)[:rows],
            bm.reshape(nb * block, -1)[:rows])


def _sparse24_scatter(compressed, bitmask, shape):
    rows, cols = shape
    mask = unpack_bitmasks(bitmask, (rows, cols))
    flat_m = mask.reshape(-1, 4)
    flat_c = compressed.reshape(-1, 2)
    # position of each element within its group among kept elements
    cum = jnp.cumsum(flat_m, axis=-1) - 1
    gather_idx = jnp.clip(cum, 0, 1)
    vals = jnp.take_along_axis(flat_c, gather_idx, axis=-1)
    dense = jnp.where(flat_m, vals, 0)
    return dense.reshape(rows, cols).astype(compressed.dtype)


@partial(jax.jit, static_argnames=("shape",))
def sparse24_decompress(
    compressed: jnp.ndarray, bitmask: jnp.ndarray, shape: tuple[int, int]
) -> jnp.ndarray:
    """Scatter (R, C/2) values back to dense (R, C) using the bitmask.

    Row-blocked: the (R*C/4, 4)-shaped temporaries of the scatter pad ~32x
    on TPU lanes (4 -> 128), which at 8B weight shapes is >10 GB of HLO
    temp; `lax.map` over row blocks bounds the padded temporary to ~64 MB
    while keeping one compile."""
    rows, cols = shape
    block = max(8, min(rows, (2 << 20) // max(cols, 1)))
    nb = -(-rows // block)
    if nb <= 1:
        return _sparse24_scatter(compressed, bitmask, shape)
    pad_rows = nb * block - rows
    comp = jnp.pad(compressed, ((0, pad_rows), (0, 0)))
    bm = jnp.pad(bitmask, ((0, pad_rows), (0, 0)))
    dense = jax.lax.map(
        lambda cb: _sparse24_scatter(cb[0], cb[1], (block, cols)),
        (comp.reshape(nb, block, -1), bm.reshape(nb, block, -1)),
    )
    return dense.reshape(nb * block, cols)[:rows]


def bitmask_compress(weight: jnp.ndarray):
    """Unstructured bitmask compression -> (values 1-D, bitmask, row_offsets).

    Note: the values gather is data-dependent, so this runs outside jit (it is
    a save-time codec, not an inference op).
    """
    mask = np.asarray(weight != 0)
    bitmask = pack_bitmasks(jnp.asarray(mask))
    w = np.asarray(weight)
    values = jnp.asarray(w[mask])
    row_counts = mask.sum(axis=-1)
    row_offsets = jnp.asarray(
        np.cumsum(row_counts) - row_counts, dtype=jnp.int64
        if jax.config.jax_enable_x64 else jnp.int32
    )
    return values, bitmask, row_offsets


def bitmask_decompress(
    values: jnp.ndarray, bitmask: jnp.ndarray, shape: tuple[int, int]
) -> jnp.ndarray:
    """Scatter 1-D nonzero values back to dense via the bitmask."""
    mask = np.asarray(unpack_bitmasks(bitmask, tuple(shape)))
    out = np.zeros(tuple(shape), dtype=values.dtype)
    out[mask] = np.asarray(values)
    return jnp.asarray(out)
