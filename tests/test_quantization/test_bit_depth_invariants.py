"""Bit-depth qparam invariants, ported from the reference's
tests/test_quantization/test_configs/test_bit_depths.py: for every
(bit_depth, type, symmetry, with/without input activations) combination,
calibrated qparams must satisfy the range laws — zero_point inside the
quantized domain, scale spanning the observed range to within one step,
and every quantized value bounded by the domain."""

import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from compressed_tensors_tpu.ops import calculate_qparams
from compressed_tensors_tpu.ops.quantize import fake_quantize, quantize
from compressed_tensors_tpu.quantization import QuantizationArgs


def _calib(value, args):
    mn = jnp.min(value).reshape(1)
    mx = jnp.max(value).reshape(1)
    return calculate_qparams(mn, mx, args)


@pytest.mark.parametrize("bit_depth", [4, 8])
@pytest.mark.parametrize("input_symmetry", [True, False, None])
@pytest.mark.parametrize("weight_symmetry", [True, False])
def test_int_bit_depths(bit_depth, input_symmetry, weight_symmetry, rng):
    """ref test_bit_depths:39-99 — int domain [-2^(b-1), 2^(b-1)-1]."""
    qmin = -(2 ** (bit_depth - 1))
    qmax = 2 ** (bit_depth - 1) - 1

    w = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    wargs = QuantizationArgs(num_bits=bit_depth, type="int",
                             symmetric=weight_symmetry, strategy="tensor")
    w_scale, w_zp = _calib(w, wargs)

    assert int(w_zp[0]) >= qmin and int(w_zp[0]) <= qmax

    # the calibrated (scale, zp) reach the observed max or min to within
    # one quantization step (ref's diff_from_max/min < scale law)
    w_max, w_min = float(jnp.max(w)), float(jnp.min(w))
    s = float(w_scale[0])
    diff_max = abs(abs(s * (qmax - int(w_zp[0]))) - abs(w_max))
    diff_min = abs(abs(s * abs(qmin - int(w_zp[0]))) - abs(w_min))
    assert diff_max < s or diff_min < s

    # fake-quantized values stay within the representable span
    fq = fake_quantize(w, w_scale, w_zp, wargs)
    lo = s * (qmin - int(w_zp[0]))
    hi = s * (qmax - int(w_zp[0]))
    assert float(jnp.min(fq)) >= lo - 1e-6
    assert float(jnp.max(fq)) <= hi + 1e-6

    # integer codes bounded by the domain
    q = quantize(w, w_scale, w_zp, wargs, dtype=jnp.int8)
    assert int(jnp.min(q)) >= qmin
    assert int(jnp.max(q)) <= qmax

    if input_symmetry is not None:
        x = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32))
        iargs = QuantizationArgs(num_bits=bit_depth, type="int",
                                 symmetric=input_symmetry, strategy="tensor")
        i_scale, i_zp = _calib(x, iargs)
        assert int(i_zp[0]) >= qmin and int(i_zp[0]) <= qmax
        x_max, x_min = float(jnp.max(x)), float(jnp.min(x))
        si = float(i_scale[0])
        diff_max = abs(abs(si * (qmax - int(i_zp[0]))) - abs(x_max))
        diff_min = abs(abs(si * abs(qmin - int(i_zp[0]))) - abs(x_min))
        assert diff_max < si or diff_min < si


@pytest.mark.parametrize("weight_symmetry", [True, False])
def test_fp8_bit_depth(weight_symmetry, rng):
    """ref test_fp8:103-162 — float8_e4m3 domain [-448, 448]; codes must
    round-trip through the fp8 storage dtype without clipping."""
    fmax = float(ml_dtypes.finfo(ml_dtypes.float8_e4m3fn).max)

    w = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    args = QuantizationArgs(num_bits=8, type="float",
                            symmetric=weight_symmetry, strategy="tensor")
    scale, zp = _calib(w, args)

    # zero point lives in the fp8 domain and survives the fp8 cast
    zp_f = float(jnp.asarray(zp, jnp.float32)[0])
    assert -fmax <= zp_f <= fmax
    zp8 = np.asarray(zp_f, ml_dtypes.float8_e4m3fn)
    assert np.isfinite(zp8.astype(np.float32))

    q = quantize(w, scale, zp, args, dtype=jnp.float8_e4m3fn)
    qf = jnp.asarray(q, jnp.float32)
    assert float(jnp.max(jnp.abs(qf))) <= fmax

    fq = fake_quantize(w, scale, zp, args)
    # fp8 fake-quant reconstruction stays within one scale step of the
    # observed envelope
    s = float(scale[0])
    assert float(jnp.max(fq)) <= float(jnp.max(w)) + s
    assert float(jnp.min(fq)) >= float(jnp.min(w)) - s


@pytest.mark.parametrize("bit_depth", [2, 3, 4, 5, 6, 8])
def test_symmetric_zero_point_is_zero(bit_depth, rng):
    """Symmetric int calibration pins zp to 0 at every width the packed
    codec supports (domain center; ref qparam semantics)."""
    w = jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32))
    args = QuantizationArgs(num_bits=bit_depth, type="int", symmetric=True,
                            strategy="tensor")
    _, zp = _calib(w, args)
    assert int(zp[0]) == 0
