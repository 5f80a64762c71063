"""QDQ strategy x dtype matrix, ported from the reference's
tests/test_quantization/lifecycle/test_forward.py (:618-1160):

- fused fake_quantize == sequential quantize -> dequantize for every
  (num_bits, type, symmetric, global_scale, group_size) combination
- our jnp implementation == the torch reference oracle (the TPU analogue
  of the reference's backend cross-checks — our one non-eager backend is
  the jnp/XLA path, pinned here against the reference's eager math)
- block quantization: static shapes, non-divisible padding, padded-region
  value correctness, 4D-block-view inputs
- transposed/viewed inputs (the reference's non-contiguous cases — JAX
  arrays are always logical, so the invariant is transpose-then-QDQ ==
  QDQ-then-transpose)
"""

import math
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "_stubs"))
from oracle import load_reference  # noqa: E402

from compressed_tensors_tpu.ops import (  # noqa: E402
    calculate_range,
    dequantize,
    fake_quantize,
    quantize,
)
from compressed_tensors_tpu.quantization import QuantizationArgs  # noqa: E402

NUM_ROWS, NUM_COLS = 128, 256

MATRIX = [
    # (num_bits, type, symmetric, global_scale, group_size)
    (8, "int", True, None, None),
    (8, "int", False, None, None),
    (4, "int", True, None, None),
    (4, "float", True, None, None),  # FP4
    (8, "float", True, None, None),
    (8, "float", True, 2.0, None),
    (8, "int", False, 2.0, None),
    (8, "int", True, None, 128),
    (8, "int", False, None, 128),
    (4, "int", True, None, 128),
    (4, "float", True, None, 128),  # FP4
    (8, "float", True, None, 128),
    (8, "float", True, 2.0, 128),
    (8, "int", False, 2.0, 128),
    (8, "int", True, None, 64),
    (8, "int", False, None, 256),
]

IDS = [
    f"{b}{t}{'sym' if s else 'asym'}"
    f"{'_gs' if g else ''}{'_g' + str(gs) if gs else ''}"
    for b, t, s, g, gs in MATRIX
]


def _build_case(num_bits, type_, symmetric, global_scale, group_size, rng):
    if group_size is None:
        args = QuantizationArgs(num_bits=num_bits, type=type_,
                                symmetric=symmetric, strategy="tensor")
        scale = np.float32(rng.uniform() * 0.01 + 0.001).reshape(1)
        zero_point = None if symmetric else np.asarray([3.0], np.float32)
    else:
        num_groups = NUM_COLS // group_size
        args = QuantizationArgs(num_bits=num_bits, type=type_,
                                symmetric=symmetric, strategy="group",
                                group_size=group_size)
        scale = (rng.uniform(size=(NUM_ROWS, num_groups)) * 0.01
                 + 0.001).astype(np.float32)
        zero_point = (None if symmetric else
                      np.full((NUM_ROWS, num_groups), 3.0, np.float32))
    x = rng.standard_normal((NUM_ROWS, NUM_COLS)).astype(np.float32)
    gs = None if global_scale is None else np.asarray([global_scale],
                                                      np.float32)
    return args, x, scale, zero_point, gs


@pytest.mark.parametrize(
    "num_bits,type_,symmetric,global_scale,group_size", MATRIX, ids=IDS)
def test_quantize_dequantize_matches_sequential(
    num_bits, type_, symmetric, global_scale, group_size, rng
):
    """Fused fake_quantize == quantize then dequantize
    (ref test_quantize_dequantize_matches_sequential:649)."""
    args, x, scale, zero_point, gs = _build_case(
        num_bits, type_, symmetric, global_scale, group_size, rng)

    q = quantize(jnp.asarray(x), jnp.asarray(scale),
                 None if zero_point is None else jnp.asarray(zero_point),
                 args, global_scale=gs)
    sequential = dequantize(
        q, jnp.asarray(scale),
        None if zero_point is None else jnp.asarray(zero_point),
        args, global_scale=gs)
    fused = fake_quantize(
        jnp.asarray(x), jnp.asarray(scale),
        None if zero_point is None else jnp.asarray(zero_point),
        args, global_scale=gs)

    if type_ == "int":
        atol, rtol = 1.0, 0  # +/-1 rounding corner cases, like the ref
    else:
        atol, rtol = 1e-5, 0.15
    np.testing.assert_allclose(np.asarray(sequential, np.float32),
                               np.asarray(fused, np.float32),
                               atol=atol, rtol=rtol)


@pytest.mark.parametrize(
    "num_bits,type_,symmetric,global_scale,group_size", MATRIX, ids=IDS)
def test_qdq_matches_reference_oracle(
    num_bits, type_, symmetric, global_scale, group_size, rng
):
    """Our jnp quantize/fake_quantize == the torch reference's
    (the backend cross-check of ref test_forward.py:766/1120, with the
    actual reference library as the second backend)."""
    ct = load_reference()
    if ct is None:
        pytest.skip("reference library not available")
    import torch
    from compressed_tensors.quantization import (
        QuantizationArgs as RefArgs,
        fake_quantize as ref_fake_quantize,
        quantize as ref_quantize,
    )

    args, x, scale, zero_point, gs = _build_case(
        num_bits, type_, symmetric, global_scale, group_size, rng)
    ref_args = RefArgs(**{
        k: v for k, v in args.model_dump().items()
        if k in ("num_bits", "type", "symmetric", "strategy", "group_size")
    })

    def t(v):
        return None if v is None else torch.from_numpy(np.asarray(v))

    ours_q = np.asarray(quantize(
        jnp.asarray(x), jnp.asarray(scale),
        None if zero_point is None else jnp.asarray(zero_point),
        args, global_scale=gs), np.float32)
    ref_q = ref_quantize(
        t(x), t(scale), t(zero_point), ref_args,
        global_scale=t(gs)).to(torch.float32).numpy()
    atol = 1.0 if type_ == "int" else 1e-5
    np.testing.assert_allclose(ours_q, ref_q, atol=atol, rtol=0.15)

    ours_fq = np.asarray(fake_quantize(
        jnp.asarray(x), jnp.asarray(scale),
        None if zero_point is None else jnp.asarray(zero_point),
        args, global_scale=gs), np.float32)
    ref_fq = ref_fake_quantize(
        t(x), t(scale), t(zero_point), ref_args,
        global_scale=t(gs)).to(torch.float32).numpy()
    # fake-quant outputs are in x-space: tolerance scales with scale
    np.testing.assert_allclose(ours_fq, ref_fq, atol=float(scale.max()) * 2,
                               rtol=0.15)


@pytest.mark.parametrize(
    "num_bits,type_,symmetric,global_scale,group_size",
    [m for m in MATRIX if m[4] is not None], ids=[
        i for i, m in zip(IDS, MATRIX) if m[4] is not None])
def test_qdq_transposed_view_matches(
    num_bits, type_, symmetric, global_scale, group_size, rng
):
    """The reference's non-contiguous cases (test_forward.py:875): QDQ of a
    transposed view equals the transpose of QDQ — JAX arrays are logical,
    so this pins that no hidden layout assumption leaks into the math."""
    args, x, scale, zero_point, gs = _build_case(
        num_bits, type_, symmetric, global_scale, group_size, rng)
    zp = None if zero_point is None else jnp.asarray(zero_point)

    direct = fake_quantize(jnp.asarray(x), jnp.asarray(scale), zp, args,
                           global_scale=gs)
    # build x from a transposed base (the torch test's .t() view)
    x_t = np.ascontiguousarray(x.T)
    via_view = fake_quantize(jnp.asarray(x_t).T, jnp.asarray(scale), zp,
                             args, global_scale=gs)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(via_view))


# --------------------------------------------------------------------------- #
# block quantization (ref test_forward.py:442-616, :982 4D views)

def _block_args(bh, bw):
    return QuantizationArgs(num_bits=8, type="float", symmetric=True,
                            strategy="block", block_structure=[bh, bw])


def test_process_quantization_block_static(rng):
    rows, cols, bh, bw = 8, 8, 2, 4
    x = rng.standard_normal((rows, cols)).astype(np.float32)
    args = _block_args(bh, bw)
    scale = (rng.uniform(size=(rows // bh, cols // bw)) + 0.1).astype(
        np.float32)
    zp = np.zeros_like(scale)

    out = quantize(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(zp), args)
    assert out.shape == x.shape
    out2 = fake_quantize(jnp.asarray(x), jnp.asarray(scale),
                         jnp.asarray(zp), args)
    assert out2.shape == x.shape


@pytest.mark.parametrize(
    "rows,cols,bh,bw",
    [
        (4544, 768, 128, 128),  # Falcon-7B dims
        (100, 200, 128, 128),   # both non-divisible
        (256, 300, 128, 128),   # cols non-divisible
        (300, 256, 128, 128),   # rows non-divisible
        (127, 127, 128, 128),   # smaller than one block
        (1, 1, 128, 128),       # minimal
    ],
)
def test_block_non_divisible_shapes(rows, cols, bh, bw, rng):
    """Non-divisible dims pad internally and restore the original shape
    (ref test_process_quantization_block_non_divisible:499)."""
    x = rng.standard_normal((rows, cols)).astype(np.float32)
    args = _block_args(bh, bw)
    scale = (rng.uniform(size=(math.ceil(rows / bh), math.ceil(cols / bw)))
             + 0.1).astype(np.float32)
    zp = np.zeros_like(scale)
    out = quantize(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(zp), args)
    assert out.shape == x.shape
    out2 = fake_quantize(jnp.asarray(x), jnp.asarray(scale),
                         jnp.asarray(zp), args)
    assert out2.shape == x.shape


@pytest.mark.parametrize(
    "rows,cols,bh,bw",
    [(100, 200, 128, 128), (256, 300, 128, 128), (300, 256, 128, 128),
     (127, 127, 128, 128)],
)
def test_block_non_divisible_values(rows, cols, bh, bw, rng):
    """Every position QDQs with its own block's scale — padding must not
    leak into values (ref :558)."""
    x = rng.standard_normal((rows, cols)).astype(np.float32)
    args = _block_args(bh, bw)
    nrb, ncb = math.ceil(rows / bh), math.ceil(cols / bw)
    scale = (rng.uniform(size=(nrb, ncb)) + 0.1).astype(np.float32)
    zp = np.zeros_like(scale)
    got = np.asarray(fake_quantize(jnp.asarray(x), jnp.asarray(scale),
                                   jnp.asarray(zp), args), np.float32)
    # manual per-block fake-quant reference in numpy
    q_min, q_max = calculate_range(args)
    import ml_dtypes

    for rb in range(nrb):
        for cb in range(ncb):
            blk = x[rb * bh:(rb + 1) * bh, cb * bw:(cb + 1) * bw]
            s = scale[rb, cb]
            q = np.clip(blk / s, q_min, q_max).astype(
                ml_dtypes.float8_e4m3fn).astype(np.float32)
            expect = q * s
            np.testing.assert_allclose(
                got[rb * bh:(rb + 1) * bh, cb * bw:(cb + 1) * bw], expect,
                atol=1e-6, err_msg=f"block ({rb},{cb})")


@pytest.mark.parametrize("num_block_rows,num_block_cols,block_structure",
                         [(2, 3, [16, 32]), (4, 4, [8, 8])])
def test_block_4d_view_matches_2d(num_block_rows, num_block_cols,
                                  block_structure, rng):
    """The reference's 4D block case builds the blocked view of a 2D tensor
    (ref :982). Pin the same invariant: quantizing the 2D tensor blockwise
    equals quantizing each block of its 4D blocked view per-tensor."""
    bh, bw = block_structure
    rows, cols = num_block_rows * bh, num_block_cols * bw
    x2d = rng.standard_normal((rows, cols)).astype(np.float32)
    scale = (rng.uniform(size=(num_block_rows, num_block_cols)) * 0.01
             + 0.001).astype(np.float32)
    args = _block_args(bh, bw)
    got = np.asarray(quantize(jnp.asarray(x2d), jnp.asarray(scale),
                              jnp.asarray(np.zeros_like(scale)), args),
                     np.float32)
    blocked = x2d.reshape(num_block_rows, bh, num_block_cols, bw).transpose(
        0, 2, 1, 3)
    t_args = QuantizationArgs(num_bits=8, type="float", symmetric=True,
                              strategy="tensor")
    for rb in range(num_block_rows):
        for cb in range(num_block_cols):
            q = np.asarray(quantize(
                jnp.asarray(blocked[rb, cb]),
                jnp.asarray(scale[rb, cb].reshape(1)), None, t_args),
                np.float32)
            np.testing.assert_allclose(
                got[rb * bh:(rb + 1) * bh, cb * bw:(cb + 1) * bw], q,
                atol=1e-6)


def test_fake_quantize_2d(rng):
    """Channel-strategy fake-quant on a 2D weight keeps shape and stays
    within one scale step of the input clamp (ref test_fake_quantize_2d)."""
    x = rng.standard_normal((64, 32)).astype(np.float32) * 0.1
    args = QuantizationArgs(num_bits=8, type="int", symmetric=True,
                            strategy="channel")
    scale = np.abs(x).max(axis=1, keepdims=True).astype(np.float32) / 127.0
    out = fake_quantize(jnp.asarray(x), jnp.asarray(scale), None, args)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), x,
                               atol=float(scale.max()) + 1e-6)
