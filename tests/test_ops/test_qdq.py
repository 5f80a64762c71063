"""QDQ correctness across strategies, cross-checked against the torch
reference (mirrors reference tests/test_quantization/lifecycle/test_forward.py).
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "_stubs"))
from oracle import load_reference  # noqa: E402

from compressed_tensors_tpu.ops import (  # noqa: E402
    calculate_qparams,
    compute_dynamic_scales_and_zp,
    dequantize,
    fake_quantize,
    quantize,
)
from compressed_tensors_tpu.quantization import QuantizationArgs  # noqa: E402


def _minmax(x, args):
    """Observed min/max per strategy (the role of the observer fixtures in the
    reference tests)."""
    strategy = args.strategy
    if strategy == "tensor":
        return x.min(), x.max()
    if strategy == "channel":
        return x.min(axis=-1, keepdims=True), x.max(axis=-1, keepdims=True)
    if strategy in ("group", "tensor_group"):
        g = x.reshape(x.shape[0], -1, args.group_size)
        return g.min(-1), g.max(-1)
    if strategy == "block":
        bh, bw = args.block_structure
        r, c = x.shape
        b = x.reshape(r // bh, bh, c // bw, bw).transpose(0, 2, 1, 3)
        return b.min(axis=(2, 3)), b.max(axis=(2, 3))
    raise ValueError(strategy)


CASES = [
    QuantizationArgs(num_bits=8, type="int", symmetric=True, strategy="tensor"),
    QuantizationArgs(num_bits=8, type="int", symmetric=False, strategy="tensor"),
    QuantizationArgs(num_bits=8, type="int", symmetric=True, strategy="channel"),
    QuantizationArgs(num_bits=8, type="int", symmetric=False, strategy="channel"),
    QuantizationArgs(num_bits=8, type="int", symmetric=False, group_size=32),
    QuantizationArgs(num_bits=4, type="int", symmetric=True, group_size=64),
    QuantizationArgs(num_bits=4, type="int", symmetric=False, group_size=64),
    QuantizationArgs(num_bits=2, type="int", symmetric=True, group_size=32),
    QuantizationArgs(num_bits=3, type="int", symmetric=True, strategy="channel"),
    QuantizationArgs(num_bits=6, type="int", symmetric=False, strategy="channel"),
    QuantizationArgs(num_bits=8, type="float", symmetric=True, strategy="tensor"),
    QuantizationArgs(num_bits=8, type="float", symmetric=True, strategy="channel"),
    QuantizationArgs(num_bits=8, type="float", symmetric=True, group_size=32),
    QuantizationArgs(num_bits=8, type="float", symmetric=True, strategy="block",
                     block_structure=[8, 64]),
    QuantizationArgs(num_bits=8, type="int", symmetric=True, strategy="block",
                     block_structure=[4, 32]),
]


@pytest.mark.parametrize("args", CASES, ids=[str(i) for i in range(len(CASES))])
def test_qdq_roundtrip_consistency(args, rng):
    """dequantize(quantize(x)) == fake_quantize(x) for every strategy."""
    x = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
    mn, mx = _minmax(np.asarray(x), args)
    scale, zp = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)
    q = quantize(x, scale, zp, args)
    dq = dequantize(q, scale, zp, args)
    fq = fake_quantize(x, scale, zp, args)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(fq), atol=1e-5)


@pytest.mark.parametrize("args", CASES, ids=[str(i) for i in range(len(CASES))])
def test_fake_quantize_matches_reference(args, rng):
    ref = load_reference()
    if ref is None:
        pytest.skip("reference oracle unavailable")
    import torch
    from compressed_tensors.quantization import QuantizationArgs as RefArgs
    from compressed_tensors.quantization.lifecycle.forward import (
        fake_quantize as ref_fake_quantize,
    )
    from compressed_tensors.quantization.utils import (
        calculate_qparams as ref_calculate_qparams,
    )

    ref_args = RefArgs(**{k: v for k, v in args.model_dump().items()
                          if k not in ("scale_dtype", "zp_dtype")})

    x = rng.normal(size=(16, 128)).astype(np.float32)
    mn, mx = _minmax(x, args)

    ref_scale, ref_zp = ref_calculate_qparams(
        torch.tensor(np.asarray(mn)), torch.tensor(np.asarray(mx)), ref_args
    )
    scale, zp = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)

    np.testing.assert_allclose(
        np.asarray(scale), ref_scale.numpy(), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_array_equal(
        np.asarray(zp).astype(np.float32),
        ref_zp.to(torch.float32).numpy(),
    )

    ours = fake_quantize(jnp.asarray(x), scale, zp, args)
    theirs = ref_fake_quantize(
        torch.tensor(x), ref_scale, ref_zp, ref_args
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-6)


def test_dynamic_token_scales_match_reference(rng):
    ref = load_reference()
    if ref is None:
        pytest.skip("reference oracle unavailable")
    import torch
    from compressed_tensors.quantization import QuantizationArgs as RefArgs
    from compressed_tensors.quantization.utils import (
        compute_dynamic_scales_and_zp as ref_dyn,
    )

    args = QuantizationArgs(num_bits=8, type="int", strategy="token", dynamic=True)
    ref_args = RefArgs(num_bits=8, type="int", strategy="token", dynamic=True)
    x = rng.normal(size=(2, 5, 64)).astype(np.float32)

    scale, zp = compute_dynamic_scales_and_zp(jnp.asarray(x), args)
    ref_scale, ref_zp = ref_dyn(torch.tensor(x), ref_args, module=None)
    np.testing.assert_allclose(np.asarray(scale), ref_scale.numpy(), rtol=1e-6)


def test_dequantize_infers_strategy(rng):
    """Strategy inference from scale shape (ref forward.py:99-130)."""
    x = rng.normal(size=(8, 64)).astype(np.float32)

    # group: scale (8, 4) -> group_size 16
    args = QuantizationArgs(num_bits=8, type="int", group_size=16)
    mn, mx = _minmax(x, args)
    scale, zp = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)
    q = quantize(jnp.asarray(x), scale, zp, args)
    explicit = dequantize(q, scale, zp, args)
    inferred = dequantize(q, scale, zp)  # no args
    np.testing.assert_allclose(np.asarray(explicit), np.asarray(inferred))

    # channel: scale (8, 1)
    args = QuantizationArgs(num_bits=8, type="int", strategy="channel")
    mn, mx = _minmax(x, args)
    scale, zp = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)
    q = quantize(jnp.asarray(x), scale, zp, args)
    np.testing.assert_allclose(
        np.asarray(dequantize(q, scale, zp, args)),
        np.asarray(dequantize(q, scale, zp)),
    )


def test_attn_head_strategy_matches_reference(rng):
    """attn_head strategy: per-head scales shaped (heads, 1, 1) applied over
    (B, heads, S, head_dim) attention states (ref quant_args strategy +
    initialize.py:279-334 shapes)."""
    ref = load_reference()
    if ref is None:
        pytest.skip("reference oracle unavailable")
    import torch
    from compressed_tensors.quantization import QuantizationArgs as RefArgs
    from compressed_tensors.quantization.lifecycle.forward import (
        fake_quantize as ref_fake_quantize,
    )

    args = QuantizationArgs(num_bits=8, type="float", symmetric=True,
                            strategy="attn_head")
    ref_args = RefArgs(num_bits=8, type="float", symmetric=True,
                       strategy="attn_head")
    x = rng.normal(size=(2, 4, 5, 16)).astype(np.float32)
    # per-head maxabs -> scale (heads, 1, 1)
    mn = x.min(axis=(0, 2, 3))[:, None, None]
    mx = x.max(axis=(0, 2, 3))[:, None, None]
    scale, zp = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)
    ours = fake_quantize(jnp.asarray(x), scale, zp, args)

    ref_scale = torch.tensor(np.asarray(scale))
    theirs = ref_fake_quantize(torch.tensor(x), ref_scale, None,
                               ref_args).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-6)


def test_g_idx_permutation_roundtrip(rng):
    """Activation-ordered (actorder=group) QDQ: permutation + inverse must
    round-trip (ref forward_helpers.py:149-176)."""
    args = QuantizationArgs(num_bits=4, type="int", group_size=16,
                            actorder="group")
    x = rng.normal(size=(8, 64)).astype(np.float32)
    g_idx = rng.permutation(np.repeat(np.arange(4), 16)).astype(np.int32)

    perm = np.argsort(g_idx)
    xp = x[:, perm]
    mn, mx = _minmax(xp, args)
    scale, zp = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)

    fq = fake_quantize(jnp.asarray(x), scale, zp, args, g_idx=jnp.asarray(g_idx))

    # manual: permute, fake-quant groups, unpermute
    fq_manual = fake_quantize(jnp.asarray(xp), scale, zp,
                              QuantizationArgs(num_bits=4, type="int",
                                               group_size=16))
    fq_manual = np.asarray(fq_manual)[:, np.argsort(perm)]
    np.testing.assert_allclose(np.asarray(fq), fq_manual, atol=1e-6)
