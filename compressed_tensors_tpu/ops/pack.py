"""Dense int32 bit-packing codec for 1-8 bit integer weights.

Bit-for-bit compatible with the reference's pack/unpack
(`compressors/pack_quantized/helpers.py:20-180`): E elements of B bits pack
into ceil(E*B/32) int32 words with no padding bits; elements may straddle
word boundaries. Values are offset to unsigned by ``1 << (num_bits-1)``
before packing.

The bit layout is position-static for a given num_bits, so all index maps are
precomputed as numpy constants and the jnp implementation is a pair of
gathers + shifts that XLA vectorizes over the full tensor.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pack_to_int32", "unpack_from_int32", "packed_cols"]


def packed_cols(cols: int, num_bits: int) -> int:
    """Number of int32 words per row after packing."""
    return math.ceil(cols * num_bits / 32)


@lru_cache(maxsize=None)
def _layout(num_bits: int):
    """Static per-element layout for one 32-element group.

    Returns (word_idx[32], bit_offset[32], lo_bits[32]) where element i
    occupies bits [bit_offset, bit_offset+lo_bits) of word word_idx and, when
    lo_bits < num_bits, the remaining high bits sit at the bottom of
    word_idx+1.
    """
    elem = np.arange(32, dtype=np.int64)
    bit_starts = elem * num_bits
    word_idx = (bit_starts // 32).astype(np.int32)
    bit_offset = (bit_starts % 32).astype(np.int32)
    lo_bits = np.minimum(32 - bit_offset, num_bits).astype(np.int32)
    return word_idx, bit_offset, lo_bits


@partial(jax.jit, static_argnames=("num_bits", "packed_dim"))
def _pack_2d(value: jnp.ndarray, num_bits: int, packed_dim: int) -> jnp.ndarray:
    offset = 1 << (num_bits - 1)
    value = value.astype(jnp.int32) + offset

    if packed_dim == 0:
        value = value.T

    rows, cols = value.shape
    n_packed = packed_cols(cols, num_bits)

    padded_cols = math.ceil(cols / 32) * 32
    if padded_cols > cols:
        value = jnp.pad(value, ((0, 0), (0, padded_cols - cols)))

    num_groups = padded_cols // 32
    value_g = value.reshape(rows * num_groups, 32).astype(jnp.uint32)

    word_idx, bit_offset, lo_bits = _layout(num_bits)

    words = []
    for j in range(num_bits):
        acc = jnp.zeros((rows * num_groups,), dtype=jnp.uint32)
        for i in range(32):
            if word_idx[i] == j:
                acc = acc | (value_g[:, i] << int(bit_offset[i]))
            elif word_idx[i] + 1 == j and lo_bits[i] < num_bits:
                acc = acc | (value_g[:, i] >> int(lo_bits[i]))
        words.append(acc)
    output_g = jnp.stack(words, axis=1)

    output = output_g.reshape(rows, num_groups * num_bits)[:, :n_packed]
    output = jax.lax.bitcast_convert_type(output, jnp.int32)

    if packed_dim == 0:
        output = output.T
    return output


@partial(jax.jit, static_argnames=("num_bits", "cols", "packed_dim"))
def _unpack_2d(
    value: jnp.ndarray, num_bits: int, cols: int, packed_dim: int
) -> jnp.ndarray:
    if packed_dim == 0:
        value = value.T

    rows, num_words = value.shape
    value = jax.lax.bitcast_convert_type(value, jnp.uint32)

    if num_words % num_bits != 0:
        pad_words = num_bits - (num_words % num_bits)
        value = jnp.pad(value, ((0, 0), (0, pad_words)))
        num_words += pad_words

    num_groups = num_words // num_bits
    value_g = value.reshape(rows * num_groups, num_bits)

    word_idx, bit_offset, lo_bits = _layout(num_bits)

    # low bits gather: element i from word word_idx[i]
    gathered = value_g[:, word_idx]  # (rows_g, 32)
    out = (gathered >> jnp.asarray(bit_offset, jnp.uint32)) & (
        (jnp.uint32(1) << jnp.asarray(lo_bits, jnp.uint32)) - 1
    )

    # straddling elements: top bits from the next word
    ov_mask = lo_bits < num_bits
    if ov_mask.any():
        ov_idx = np.nonzero(ov_mask)[0]
        hi_bits = (num_bits - lo_bits[ov_idx]).astype(np.int64)
        right = (
            value_g[:, word_idx[ov_idx] + 1]
            & ((jnp.uint32(1) << jnp.asarray(hi_bits, jnp.uint32)) - 1)
        ) << jnp.asarray(lo_bits[ov_idx], jnp.uint32)
        out = out.at[:, ov_idx].set(out[:, ov_idx] | right)

    output = out.reshape(rows, num_groups * 32)[:, :cols]

    if packed_dim == 0:
        output = output.T

    offset = 1 << (num_bits - 1)
    return (output.astype(jnp.int32) - offset).astype(jnp.int8)


def pack_to_int32(
    value: jnp.ndarray, num_bits: int, packed_dim: int = 1
) -> jnp.ndarray:
    """Pack an int8 tensor of B-bit values into int32 (ref helpers.py:20-101).

    Handles N-D tensors (e.g. 3D MoE weights) by packing each trailing-2D
    slice; packed_dim selects which of the last two dims is packed.
    """
    if value.dtype != jnp.int8:
        raise ValueError("Tensor must be quantized to int8 before packing")
    if not 1 <= num_bits <= 8:
        raise ValueError(
            f"Packing is only supported for num_bits in [1, 8], got {num_bits}"
        )
    if value.ndim > 2:
        lead = value.shape[:-2]
        flat = value.reshape((-1,) + value.shape[-2:])
        packed = jax.vmap(lambda v: _pack_2d(v, num_bits, packed_dim))(flat)
        return packed.reshape(lead + packed.shape[-2:])
    return _pack_2d(value, num_bits, packed_dim)


def unpack_from_int32(
    value: jnp.ndarray,
    num_bits: int,
    shape: tuple[int, ...],
    packed_dim: int = 1,
) -> jnp.ndarray:
    """Unpack int32-packed weights back to int8 (ref helpers.py:104-180).

    :param shape: original pre-pack shape (of the trailing-2D slice for N-D)
    """
    if value.dtype != jnp.int32:
        raise ValueError(f"Expected int32 but got {value.dtype}, aborting unpack")
    if not 1 <= num_bits <= 8:
        raise ValueError(
            f"Unpacking is only supported for num_bits in [1, 8], got {num_bits}"
        )
    shape = tuple(int(s) for s in shape)
    if value.ndim > 2:
        lead = value.shape[:-2]
        flat = value.reshape((-1,) + value.shape[-2:])
        cols = shape[len(lead) + packed_dim] if len(shape) > 2 else shape[packed_dim]
        out = jax.vmap(lambda v: _unpack_2d(v, num_bits, cols, packed_dim))(flat)
        return out.reshape(lead + out.shape[-2:])
    cols = shape[packed_dim]
    return _unpack_2d(value, num_bits, cols, packed_dim)
