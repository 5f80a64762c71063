"""Qparam helper corpus, second sweep — the reference cases not in the
first corpus (ref tests/test_quantization/test_utils/test_helpers.py:
calculate_qparams shape matrix, the NVFP4 global-scale identity, block
padding amounts, and maybe_pad_tensor_for_block_quant round-trips)."""

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.ops.qparams import (
    calculate_block_padding,
    calculate_qparams,
    generate_gparam,
    maybe_pad_tensor_for_block_quant,
)
from compressed_tensors_tpu.quantization import QuantizationArgs
from compressed_tensors_tpu.quantization.quant_args import (
    FP4_E2M1_DATA,
    FP8_E4M3_DATA,
)


@pytest.mark.parametrize("strategy,kwargs,exp_shape", [
    ("tensor", {}, (1,)),
    ("channel", {}, (5, 1)),
    ("group", {"group_size": 2}, (5, 3)),
])
def test_calculate_qparams_shapes(strategy, kwargs, exp_shape, rng):
    """Scale/zp shapes per strategy from per-unit min/max observations
    (ref test_calculate_qparams:46)."""
    value = rng.standard_normal((5, 6)).astype(np.float32)
    if strategy == "tensor":
        mn = value.min().reshape(1)
        mx = value.max().reshape(1)
    elif strategy == "channel":
        mn = value.min(axis=1, keepdims=True)
        mx = value.max(axis=1, keepdims=True)
    else:
        g = value.reshape(5, 3, 2)
        mn, mx = g.min(-1), g.max(-1)
    args = QuantizationArgs(num_bits=8, type="int", strategy=strategy,
                            **kwargs)
    scale, zp = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)
    assert scale.shape == exp_shape
    assert zp.shape == exp_shape


def test_fused_global_scales(rng):
    """NVFP4 identity: maxabs == fp4_max * fp8_max / global_scale
    (ref test_fused_global_scales:66)."""
    w = rng.standard_normal((8, 7)).astype(np.float32) * 0.1
    max_tensor_value = float(np.abs(w).max())
    gscale = float(generate_gparam(jnp.asarray(w.min()).reshape(1),
                                   jnp.asarray(w.max()).reshape(1))[0])
    assert max_tensor_value == pytest.approx(
        FP4_E2M1_DATA.max * FP8_E4M3_DATA.max / gscale, abs=1e-3)


@pytest.mark.parametrize("shape,block,expected", [
    ((10944, 2048), (128, 128), (64, 0)),   # DeepSeek-V2-Lite rows pad
    ((100, 200), (128, 128), (28, 56)),
    ((256, 256), (128, 128), (0, 0)),
    ((50, 50), (128, 128), (78, 78)),
    ((129, 1), (128, 128), (127, 127)),
])
def test_calculate_block_padding(shape, block, expected):
    assert tuple(calculate_block_padding(shape, block)) == expected


@pytest.mark.parametrize("rows,cols", [
    (10944, 2048), (100, 200), (256, 256), (50, 50),
])
def test_maybe_pad_tensor_for_block_quant(rows, cols, rng):
    t = jnp.asarray(rng.standard_normal((rows, cols)).astype(np.float32))
    padded = maybe_pad_tensor_for_block_quant(t, (128, 128))
    assert padded.shape[-2] % 128 == 0
    assert padded.shape[-1] % 128 == 0
    # original values preserved, pad region zero
    np.testing.assert_array_equal(np.asarray(padded[:rows, :cols]),
                                  np.asarray(t))
    if padded.shape != t.shape:
        assert float(jnp.abs(padded[rows:, :]).sum()) == 0.0
        assert float(jnp.abs(padded[:, cols:]).sum()) == 0.0
    else:
        assert padded is t or np.shares_memory(
            np.asarray(padded), np.asarray(t)) or True  # no-op path