"""FP4 E2M1 rounding (jnp, jit-friendly).

Implements the exact threshold cascade of the reference
(`quantization/utils/fp4_utils.py:12-98`): values round to
0, ±0.5, ±1, ±1.5, ±2, ±3, ±4, ±6 with round-half-to-even tie behavior
encoded in the >=/> boundary choices. On TPU this is pure VPU work and fuses
into surrounding ops under jit; no separate kernel is needed.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["cast_to_fp4", "FP4_VALUES"]

FP4_VALUES = (0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0)


def cast_to_fp4(x: jnp.ndarray) -> jnp.ndarray:
    """Round to nearest representable E2M1 value, preserving dtype.

    Threshold boundaries follow ref fp4_utils.py:88-98 exactly:
    |x| <= 0.25 -> 0; (0.25, 0.75) -> 0.5; [0.75, 1.25] -> 1.0;
    (1.25, 1.75) -> 1.5; [1.75, 2.5] -> 2.0; (2.5, 3.5) -> 3.0;
    [3.5, 5.0] -> 4.0; > 5.0 -> 6.0.
    """
    sign = jnp.where(jnp.signbit(x), -1.0, 1.0).astype(x.dtype)
    ax = jnp.abs(x)

    result = jnp.zeros_like(ax)
    result = jnp.where(ax > 0.25, jnp.asarray(0.5, ax.dtype), result)
    result = jnp.where(ax >= 0.75, jnp.asarray(1.0, ax.dtype), result)
    result = jnp.where(ax > 1.25, jnp.asarray(1.5, ax.dtype), result)
    result = jnp.where(ax >= 1.75, jnp.asarray(2.0, ax.dtype), result)
    result = jnp.where(ax > 2.5, jnp.asarray(3.0, ax.dtype), result)
    result = jnp.where(ax >= 3.5, jnp.asarray(4.0, ax.dtype), result)
    result = jnp.where(ax > 5.0, jnp.asarray(6.0, ax.dtype), result)

    return result * sign
