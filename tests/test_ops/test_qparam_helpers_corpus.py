"""Quant-utils helper corpus, ported from the reference's
tests/test_quantization/test_utils/{test_fp4_utils,test_helpers}.py:
FP4 E2M1 boundary rounding table, calculate_qparams shapes per strategy,
the NVFP4 fused-global-scale identity, and dynamic group scale shapes."""

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.ops import (
    calculate_qparams,
    compute_dynamic_scales_and_zp,
)
from compressed_tensors_tpu.ops.fp4 import cast_to_fp4
from compressed_tensors_tpu.ops.qparams import generate_gparam
from compressed_tensors_tpu.quantization import QuantizationArgs
from compressed_tensors_tpu.quantization.quant_args import (
    FP4_E2M1_DATA,
    FP8_E4M3_DATA,
)


def test_cast_to_fp4_boundary_values():
    """The reference's explicit E2M1 rounding table
    (ref test_cast_to_fp4_boundary_values:28): exact values map to
    themselves, boundary midpoints round to even mantissas, in-between
    values round to nearest."""
    inputs = np.array([
        # exact FP4 values
        0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
        -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0,
        # boundary midpoints (round half to even)
        0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0,
        -0.25, -0.75, -1.25, -1.75, -2.5, -3.5, -5.0,
        # in-between values (round to nearest)
        0.3, 0.6, 0.9, 1.3, 1.8, 2.7, 4.5, 7.0,
        -0.3, -0.6, -0.9, -1.3, -1.8, -2.7, -4.5, -7.0,
    ], np.float32)
    expected = np.array([
        0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
        -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0,
        0.0, 1.0, 1.0, 2.0, 2.0, 4.0, 4.0,
        -0.0, -1.0, -1.0, -2.0, -2.0, -4.0, -4.0,
        0.5, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
        -0.5, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0,
    ], np.float32)
    got = np.asarray(cast_to_fp4(jnp.asarray(inputs)), np.float32)
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize(
    "keepdims,strategy,exp_shape",
    [
        (False, "tensor", (1,)),
        (True, "channel", (1, 1)),
        (True, "group", (1, 1)),
        (False, "block", (1,)),
    ],
)
def test_calculate_qparams_shapes(rng, keepdims, strategy, exp_shape):
    """Scale/zp shapes track the observed min/max shapes per strategy
    (ref test_calculate_qparams:46)."""
    value = rng.standard_normal((5, 6)).astype(np.float32)
    mn = value.min(keepdims=keepdims)
    mx = value.max(keepdims=keepdims)
    if strategy == "group":
        args = QuantizationArgs(strategy=strategy, group_size=2)
        mn, mx = mn.reshape(1, 1), mx.reshape(1, 1)
    elif strategy == "block":
        args = QuantizationArgs(strategy=strategy, block_structure=[1, 3])
    else:
        args = QuantizationArgs(strategy=strategy)
        if keepdims:
            mn, mx = np.reshape(mn, (1, 1)), np.reshape(mx, (1, 1))
    scale, zp = calculate_qparams(jnp.asarray(mn).reshape(exp_shape),
                                  jnp.asarray(mx).reshape(exp_shape), args)
    assert scale.shape == exp_shape
    assert zp.shape == exp_shape


def test_fused_global_scales(rng):
    """NVFP4 identity: maxabs == FP4_max * FP8_max / global_scale
    (ref test_fused_global_scales:66, generate_gparam semantics)."""
    w = rng.standard_normal((8, 7)).astype(np.float32) * 0.2
    max_abs = np.abs(w).max()
    gparam = float(np.asarray(generate_gparam(
        jnp.asarray(w.min()), jnp.asarray(w.max()))).reshape(()))
    assert max_abs == pytest.approx(
        FP4_E2M1_DATA.max * FP8_E4M3_DATA.max / gparam, abs=1e-3)


@pytest.mark.parametrize(
    "shape,group_size,exp_shape",
    [((1, 4, 8), 4, (1, 4, 2))],
)
def test_compute_dynamic_scales_and_zp_group(rng, shape, group_size,
                                             exp_shape):
    """Dynamic GROUP activation quantization produces (batch, tokens,
    num_groups) scales (ref test_compute_dynamic_scales_and_zp_group)."""
    value = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    args = QuantizationArgs(num_bits=8, strategy="group",
                            group_size=group_size, dynamic=True,
                            symmetric=True)
    scale, zp = compute_dynamic_scales_and_zp(value, args)
    assert scale.shape == exp_shape


def test_compute_dynamic_scales_token(rng):
    """Dynamic TOKEN quantization: one scale per token row."""
    value = jnp.asarray(rng.standard_normal((2, 5, 16)).astype(np.float32))
    args = QuantizationArgs(num_bits=8, strategy="token", dynamic=True,
                            symmetric=True)
    scale, zp = compute_dynamic_scales_and_zp(value, args)
    assert scale.shape == (2, 5, 1)
