"""FP4 (E2M1) nibble packing codec.

Bit-compatible with `compressors/nvfp4/helpers.py:108-193`: each fp4 value
maps to a 4-bit index (LUT 0,0.5,1,1.5,2,3,4,6 + sign in bit 3); consecutive
pairs pack into one uint8, low nibble first.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pack_fp4_to_uint8", "unpack_fp4_from_uint8", "KE2M1_TO_FLOAT"]

KE2M1_TO_FLOAT = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0],
                          dtype=np.float32)


@partial(jax.jit)
def pack_fp4_to_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """Pack a (m, n) tensor of exact FP4 values into (m, n//2) uint8.

    Assumes x contains ONLY valid FP4 values (call after cast_to_fp4).
    Mirrors ref nvfp4/helpers.py:108-156.
    """
    m, n = x.shape
    if n % 2 != 0:
        raise ValueError(
            "tensor must have an even number of columns for nvfp4 compression"
        )

    sign = jnp.signbit(x).astype(jnp.uint8)
    doubled = jnp.abs((x.astype(jnp.float32) * 2)).astype(jnp.int32)

    # threshold counting equals the LUT index for exact doubled values
    # {0,1,2,3,4,6,8,12} -> {0..7}
    idx = (
        (doubled >= 1).astype(jnp.uint8)
        + (doubled >= 2).astype(jnp.uint8)
        + (doubled >= 3).astype(jnp.uint8)
        + (doubled >= 4).astype(jnp.uint8)
        + (doubled >= 6).astype(jnp.uint8)
        + (doubled >= 8).astype(jnp.uint8)
        + (doubled >= 12).astype(jnp.uint8)
    )
    idx = idx | (sign << 3)

    idx = idx.reshape(-1, 2)
    packed = idx[:, 0] | (idx[:, 1] << 4)
    return packed.reshape(m, n // 2)


@partial(jax.jit, static_argnames=("m", "n", "dtype"))
def unpack_fp4_from_uint8(
    a: jnp.ndarray, m: int, n: int, dtype=jnp.bfloat16
) -> jnp.ndarray:
    """Unpack (m, n//2) uint8 into (m, n) fp4 values in `dtype`
    (ref nvfp4/helpers.py:160-193)."""
    a_flat = a.reshape(-1)
    high = (a_flat & 0xF0) >> 4
    low = a_flat & 0x0F

    combined = jnp.stack((low, high), axis=1).reshape(-1)

    signs = (combined & 0x08).astype(jnp.bool_)
    abs_idx = (combined & 0x07).astype(jnp.int32)

    values = jnp.asarray(KE2M1_TO_FLOAT)[abs_idx] * jnp.where(signs, -1.0, 1.0)
    return values.reshape(m, n).astype(dtype)
