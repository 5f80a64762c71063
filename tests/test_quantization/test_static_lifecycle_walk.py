"""Static-quantization lifecycle walks with the reference's golden
outputs, ported from tests/test_quantization/lifecycle/
test_static_lifecycle.py: a deterministic arange weight/activation is
calibrated per strategy and fake-quantized; outputs must match the
reference's recorded bf16 goldens."""

import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from compressed_tensors_tpu.ops import calculate_qparams, fake_quantize
from compressed_tensors_tpu.ops.qparams import generate_gparam
from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationScheme,
)
from compressed_tensors_tpu.quantization.lifecycle import (
    initialize_module_for_quantization,
)


def _observe_weight(w, args):
    """MockMinMaxObserver's canonical reshapes per strategy
    (ref tests/mock_observer.py:16-162)."""
    w = np.asarray(w, np.float32)
    if args.strategy == "tensor":
        return w.min().reshape(1), w.max().reshape(1)
    if args.strategy == "channel":
        return w.min(-1, keepdims=True), w.max(-1, keepdims=True)
    if args.strategy in ("group", "tensor_group"):
        g = w.reshape(w.shape[0], -1, args.group_size)
        return g.min(-1), g.max(-1)
    if args.strategy == "block":
        bh, bw = args.block_structure
        r, c = w.shape
        b = w.reshape(r // bh, bh, c // bw, bw).transpose(0, 2, 1, 3)
        return b.min(axis=(2, 3)), b.max(axis=(2, 3))
    raise ValueError(args.strategy)


WEIGHT_GOLDENS = [
    (QuantizationArgs(num_bits=4, type="int", symmetric=True,
                      strategy="tensor"),
     [0.0], [23.0],
     [[0.0000, 0.0000, 3.0625, 3.0625, 3.0625, 6.1250],
      [6.1250, 6.1250, 9.1875, 9.1875, 9.1875, 12.2500],
      [12.2500, 12.2500, 15.3125, 15.3125, 15.3125, 18.3750],
      [18.3750, 18.3750, 21.5000, 21.5000, 21.5000, 21.5000]], 0.85),
    (QuantizationArgs(num_bits=4, type="int", symmetric=True,
                      strategy="channel"),
     [[0], [6], [12], [18]], [[5], [11], [17], [23]],
     [[0.0000, 1.3359, 2.0000, 2.6719, 4.0000, 4.6875],
      [5.8750, 7.3438, 7.3438, 8.8125, 10.2500, 10.2500],
      [11.3125, 13.6250, 13.6250, 15.8750, 15.8750, 15.8750],
      [18.3750, 18.3750, 21.5000, 21.5000, 21.5000, 21.5000]], 0.45),
    (QuantizationArgs(num_bits=4, type="int", symmetric=True,
                      strategy="group", group_size=3),
     [[0, 3], [6, 9], [12, 15], [18, 21]],
     [[2, 5], [8, 11], [14, 17], [20, 23]],
     [[0.0000, 1.0703, 1.8750, 2.6719, 4.0000, 4.6875],
      [6.4375, 7.5000, 7.5000, 8.8125, 10.2500, 10.2500],
      [11.1875, 13.0625, 13.0625, 15.8750, 15.8750, 15.8750],
      [18.7500, 18.7500, 18.7500, 21.5000, 21.5000, 21.5000]], 0.45),
    (QuantizationArgs(num_bits=4, type="float", symmetric=True,
                      strategy="tensor_group", group_size=3,
                      scale_dtype="float8_e4m3fn",
                      zp_dtype="float8_e4m3fn"),
     [[0, 3], [6, 9], [12, 15], [18, 21]],
     [[2, 5], [8, 11], [14, 17], [20, 23]],
     [[0.0000, 1.0234, 2.0469, 3.2812, 3.2812, 4.9375],
      [5.4688, 8.1875, 8.1875, 10.6875, 10.6875, 10.6875],
      [9.8750, 14.7500, 14.7500, 16.3750, 16.3750, 16.3750],
      [19.7500, 19.7500, 19.7500, 23.0000, 23.0000, 23.0000]], 1.1),
    (QuantizationArgs(num_bits=4, type="int", symmetric=True,
                      strategy="block", block_structure=[2, 3]),
     [[0, 3], [12, 15]], [[8, 11], [20, 23]],
     [[0.0000, 1.0703, 2.1406, 2.9375, 4.4062, 4.4062],
      [6.4375, 7.5000, 7.5000, 8.8125, 10.2500, 10.2500],
      [10.6875, 13.3750, 13.3750, 15.3125, 15.3125, 18.3750],
      [18.7500, 18.7500, 18.7500, 21.5000, 21.5000, 21.5000]], 0.5),
]


@pytest.mark.parametrize(
    "args,exp_min,exp_max,exp_quant,exp_loss", WEIGHT_GOLDENS,
    ids=[a[0].strategy for a in WEIGHT_GOLDENS])
def test_static_weight_quantization(args, exp_min, exp_max, exp_quant,
                                    exp_loss):
    """weight = arange(24).reshape(4, 6) in bf16; calibrate, QDQ, compare
    against the reference's golden outputs."""
    w = jnp.arange(24, dtype=jnp.bfloat16).reshape(4, 6)

    scheme = QuantizationScheme(targets=[], weights=args)
    state = initialize_module_for_quantization(scheme, (4, 6),
                                               weight_dtype=jnp.bfloat16)
    assert state.scheme is scheme

    mn, mx = _observe_weight(w, args)
    np.testing.assert_array_equal(mn, np.asarray(exp_min, np.float32))
    np.testing.assert_array_equal(mx, np.asarray(exp_max, np.float32))

    global_scale = None
    if args.strategy == "tensor_group":
        global_scale = generate_gparam(jnp.asarray(w.min()),
                                       jnp.asarray(w.max()))
    scale, zp = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args,
                                  global_scale=global_scale)

    out = fake_quantize(w, scale, zp, args, global_scale=global_scale)
    got = np.asarray(out, np.float32)
    want = np.asarray(exp_quant, np.float32)
    np.testing.assert_allclose(got, want, atol=0.08, rtol=0.02)
    mse = float(np.mean((got - np.asarray(w, np.float32)) ** 2))
    assert mse <= exp_loss


ACT_GOLDENS = [
    (QuantizationArgs(num_bits=4, type="int", symmetric=True,
                      strategy="tensor"),
     [0.0], [11.0],
     [[[0.0000, 1.4688, 1.4688, 2.9375, 4.4062, 4.4062],
       [5.8750, 7.3438, 7.3438, 8.8125, 10.2500, 10.2500]]], 0.2),
    (QuantizationArgs(num_bits=4, type="float", symmetric=True,
                      strategy="tensor_group", dynamic="local",
                      group_size=3, scale_dtype="float8_e4m3fn",
                      zp_dtype="float8_e4m3fn"),
     None, None,
     [[[0.0000, 0.9844, 1.9688, 3.4062, 3.4062, 5.1250],
       [5.2500, 7.8750, 7.8750, 7.3438, 11.0000, 11.0000]]], 0.5),
]


@pytest.mark.parametrize("args,exp_min,exp_max,exp_quant,exp_loss",
                         ACT_GOLDENS, ids=["tensor", "tensor_group_local"])
def test_static_activation_quantization(args, exp_min, exp_max, exp_quant,
                                        exp_loss):
    """input = arange(12).reshape(1, 2, 6) in bf16 through an identity
    linear with input quantization."""
    x = jnp.arange(12, dtype=jnp.bfloat16).reshape(1, 2, 6)

    if args.dynamic == "local":
        # local-dynamic: static global scale + runtime local scales
        from compressed_tensors_tpu.ops.qparams import (
            compute_dynamic_scales_and_zp,
        )

        gparam = generate_gparam(jnp.asarray(x.min()), jnp.asarray(x.max()))
        scale, zp = compute_dynamic_scales_and_zp(x, args,
                                                  global_scale=gparam)
        out = fake_quantize(x, scale, zp, args, global_scale=gparam)
    else:
        mn, mx = np.float32(np.asarray(x).min()), np.float32(
            np.asarray(x).max())
        np.testing.assert_array_equal(mn.reshape(1), exp_min)
        np.testing.assert_array_equal(mx.reshape(1), exp_max)
        scale, zp = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)
        out = fake_quantize(x, scale, zp, args)

    got = np.asarray(out, np.float32)
    np.testing.assert_allclose(got, np.asarray(exp_quant, np.float32),
                               atol=0.6, rtol=0.05)
    mse = float(np.mean((got - np.asarray(x, np.float32)) ** 2))
    assert mse <= exp_loss


ATTN_GOLDENS = [
    (QuantizationArgs(num_bits=4, type="int", symmetric=True,
                      strategy="tensor"),
     [0.0], [23.0],
     [[[[0.0000, 0.0000, 3.0625, 3.0625],
        [3.0625, 6.1250, 6.1250, 6.1250],
        [9.1875, 9.1875, 9.1875, 12.2500]],
       [[12.2500, 12.2500, 15.3125, 15.3125],
        [15.3125, 18.3750, 18.3750, 18.3750],
        [21.5000, 21.5000, 21.5000, 21.5000]]]], 0.81),
    (QuantizationArgs(num_bits=4, type="int", symmetric=True,
                      strategy="attn_head"),
     [[[0.0]], [[12.0]]], [[[11.0]], [[23.0]]],
     [[[[0.0000, 1.4688, 1.4688, 2.9375],
        [4.4062, 4.4062, 5.8750, 7.3438],
        [7.3438, 8.8125, 10.2500, 10.2500]],
       [[12.2500, 12.2500, 15.3125, 15.3125],
        [15.3125, 18.3750, 18.3750, 18.3750],
        [21.5000, 21.5000, 21.5000, 21.5000]]]], 0.55),
]


@pytest.mark.parametrize("args,exp_min,exp_max,exp_quant,exp_loss",
                         ATTN_GOLDENS, ids=["tensor", "attn_head"])
def test_static_attention_quantization(args, exp_min, exp_max, exp_quant,
                                       exp_loss):
    """k states (1, 2 heads, 3, 4) = arange(24) in bf16, per-tensor and
    per-head (attn_head) static quantization — the reference's serialized
    k_scale semantics (ref test_static_lifecycle.py:275+)."""
    x = jnp.arange(24, dtype=jnp.bfloat16).reshape(1, 2, 3, 4)
    xf = np.asarray(x, np.float32)

    if args.strategy == "attn_head":
        mn = xf.min(axis=(0, 2, 3)).reshape(2, 1, 1)
        mx = xf.max(axis=(0, 2, 3)).reshape(2, 1, 1)
    else:
        mn, mx = xf.min().reshape(1), xf.max().reshape(1)
    np.testing.assert_array_equal(mn, np.asarray(exp_min, np.float32))
    np.testing.assert_array_equal(mx, np.asarray(exp_max, np.float32))

    scale, zp = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)
    if args.strategy == "attn_head":
        assert scale.shape == (2, 1, 1)  # head-shaped, ref initialize.py
    out = fake_quantize(x, scale, zp, args)
    got = np.asarray(out, np.float32)
    np.testing.assert_allclose(got, np.asarray(exp_quant, np.float32),
                               atol=0.08, rtol=0.02)
    mse = float(np.mean((got - xf) ** 2))
    assert mse <= exp_loss
