"""QDQ strategy x dtype x symmetry matrix vs a pure-numpy oracle — the
remaining breadth of the reference's
tests/test_quantization/lifecycle/test_forward.py (1,161 LoC matrix:
fused-vs-sequential across every combo, g_idx variants, dynamic
activations, fp8/fp4 ranges)."""

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.ops import (
    compute_dynamic_scales_and_zp,
    dequantize,
    fake_quantize,
    quantize,
)
from compressed_tensors_tpu.quantization import QuantizationArgs

CASES = []
for bits in (2, 4, 8):
    for sym in (True, False):
        CASES.append(dict(num_bits=bits, type="int", symmetric=sym,
                          strategy="tensor"))
        CASES.append(dict(num_bits=bits, type="int", symmetric=sym,
                          strategy="channel"))
        for gs in (32, 128):
            CASES.append(dict(num_bits=bits, type="int", symmetric=sym,
                              strategy="group", group_size=gs))
        CASES.append(dict(num_bits=bits, type="int", symmetric=sym,
                          strategy="block", block_structure=[16, 32]))
for sym in (True,):
    CASES.append(dict(num_bits=8, type="float", symmetric=sym,
                      strategy="tensor"))
    CASES.append(dict(num_bits=8, type="float", symmetric=sym,
                      strategy="channel"))
    CASES.append(dict(num_bits=8, type="float", symmetric=sym,
                      strategy="group", group_size=32))


def _ids(c):
    return (f"{c['type']}{c['num_bits']}-{c['strategy']}"
            f"{c.get('group_size', c.get('block_structure', ''))}"
            f"-{'sym' if c['symmetric'] else 'asym'}")


def _qparams(rng, w, args):
    """Observation shapes per strategy (the reference's mock-observer
    reshape spec, ref tests/mock_observer.py:16-162)."""
    from compressed_tensors_tpu.ops import calculate_qparams

    n, k = w.shape
    if args.strategy == "tensor":
        mn, mx = w.min(keepdims=True)[None], w.max(keepdims=True)[None]
        mn, mx = np.asarray([w.min()]), np.asarray([w.max()])
    elif args.strategy == "channel":
        mn = w.min(1, keepdims=True)
        mx = w.max(1, keepdims=True)
    elif args.strategy == "group":
        g = w.reshape(n, -1, args.group_size)
        mn, mx = g.min(-1), g.max(-1)
    elif args.strategy == "block":
        bh, bw = args.block_structure
        blk = w.reshape(n // bh, bh, k // bw, bw).transpose(0, 2, 1, 3)
        mn = blk.min((2, 3))
        mx = blk.max((2, 3))
    return calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)


@pytest.mark.parametrize("case", CASES, ids=_ids)
def test_fused_qdq_matches_sequential(rng, case):
    """fake_quantize == dequantize(quantize(...)) for every combo (ref
    test_quantize_dequantize_matches_sequential:649)."""
    args = QuantizationArgs(**case)
    w = (rng.normal(size=(64, 128)) * 0.3).astype(np.float32)
    scale, zp = _qparams(rng, w, args)
    if args.symmetric:
        zp = None
    fused = np.asarray(
        fake_quantize(jnp.asarray(w), scale, zp, args), np.float32)
    q = quantize(jnp.asarray(w), scale, zp, args)
    seq = np.asarray(dequantize(q, scale, zp, args), np.float32)
    np.testing.assert_allclose(fused, seq, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("case", CASES, ids=_ids)
def test_qdq_error_bounded_by_scale(rng, case):
    """|w - QDQ(w)| <= scale/2 elementwise (round-to-nearest), the
    correctness envelope every strategy must satisfy."""
    args = QuantizationArgs(**case)
    w = (rng.normal(size=(64, 128)) * 0.3).astype(np.float32)
    scale, zp = _qparams(rng, w, args)
    if args.symmetric:
        zp = None
    out = np.asarray(
        fake_quantize(jnp.asarray(w), scale, zp, args), np.float32)
    n, k = w.shape
    s = np.asarray(scale, np.float32)
    if args.strategy == "tensor":
        per_elem = np.full_like(w, s.reshape(()))
    elif args.strategy == "channel":
        per_elem = np.broadcast_to(s.reshape(n, 1), w.shape)
    elif args.strategy == "group":
        per_elem = s.reshape(n, -1).repeat(args.group_size, 1)
    elif args.strategy == "block":
        bh, bw = args.block_structure
        per_elem = s.repeat(bh, 0).repeat(bw, 1)
    if args.type == "float":
        # fp8 has relative spacing, not uniform steps; bound loosely
        per_elem = np.maximum(per_elem * 32, np.abs(w) * 0.125 + 1e-6)
    # clamping can exceed scale/2 where w falls outside the observed
    # range; allow a small saturated tail for the 2-bit cases
    inside = np.abs(out - w) <= per_elem * 0.501 + 1e-6
    frac = inside.mean()
    assert frac > (0.95 if args.num_bits == 2 else 0.999), frac


@pytest.mark.parametrize("strategy", ["token", "tensor"])
@pytest.mark.parametrize("qtype", ["int", "float"])
def test_dynamic_activation_scales(rng, strategy, qtype):
    """Dynamic per-token / per-tensor activation quantization (ref
    compute_dynamic_scales_and_zp:140-195): scales recover absmax/range."""
    args = QuantizationArgs(num_bits=8, type=qtype, strategy=strategy,
                            symmetric=True, dynamic=True)
    # token semantics keep dims (0, 1) — (batch, seq, hidden) layout, the
    # reference's convention (ref helpers.py:159-161)
    x = jnp.asarray((rng.normal(size=(2, 3, 64)) * 2).astype(np.float32))
    scale, zp = compute_dynamic_scales_and_zp(x, args)
    qmax = 127.0 if qtype == "int" else 448.0
    if strategy == "token":
        assert scale.shape == (2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(scale).ravel(),
            np.abs(np.asarray(x)).max(-1).ravel() / qmax, rtol=1e-2)
    else:
        assert np.asarray(scale).size == 1
        # scale rounds to the scheme's scale dtype (bf16) on the way out
        np.testing.assert_allclose(
            float(jnp.max(jnp.abs(x))) / qmax,
            float(np.asarray(scale).ravel()[0]), rtol=1e-2)
    out = fake_quantize(x, scale, None, args)
    tol = 2e-2 if qtype == "int" else 1e-1
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               atol=float(jnp.abs(x).max()) * tol)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("qtype", ["int", "float"])
def test_g_idx_qdq_roundtrip(rng, bits, qtype):
    """actorder=group g_idx permutation: QDQ through a permuted group
    order equals QDQ of the permuted-column matrix (ref
    _process_group:118-177)."""
    if qtype == "float" and bits == 4:
        pytest.skip("fp4 uses tensor_group, covered in test_fp4_mx")
    args = QuantizationArgs(num_bits=bits, type=qtype, strategy="group",
                            group_size=32, symmetric=True)
    n, k = 16, 128
    w = (rng.normal(size=(n, k)) * 0.3).astype(np.float32)
    perm = rng.permutation(k // 32)
    g_idx = np.repeat(perm, 32).astype(np.int32)

    order = np.argsort(g_idx, kind="stable")
    w_perm = w[:, order]
    g = w_perm.reshape(n, -1, 32)
    from compressed_tensors_tpu.ops import calculate_qparams

    scale, _ = calculate_qparams(jnp.asarray(g.min(-1)),
                                 jnp.asarray(g.max(-1)), args)
    got = np.asarray(fake_quantize(jnp.asarray(w), scale, None, args,
                                   g_idx=jnp.asarray(g_idx)), np.float32)
    want_perm = np.asarray(
        fake_quantize(jnp.asarray(w_perm), scale, None, args), np.float32)
    inv = np.empty_like(order)
    inv[order] = np.arange(k)
    np.testing.assert_allclose(got, want_perm[:, inv], atol=1e-6)


@pytest.mark.parametrize("case", CASES[:12], ids=_ids)
def test_qdq_bf16_input_close_to_f32(rng, case):
    """bf16 inputs stay within bf16 resolution of the f32 QDQ result —
    the engine executes in bf16."""
    args = QuantizationArgs(**case)
    w32 = (rng.normal(size=(32, 128)) * 0.3).astype(np.float32)
    scale, zp = _qparams(rng, w32, args)
    if args.symmetric:
        zp = None
    out32 = np.asarray(
        fake_quantize(jnp.asarray(w32), scale, zp, args), np.float32)
    out16 = np.asarray(
        fake_quantize(jnp.asarray(w32, jnp.bfloat16), scale, zp, args),
        np.float32)
    # bf16 rounding may flip values sitting on a quant-bin boundary to the
    # adjacent level: differences must be rare and at most ~one step
    n, k = w32.shape
    s = np.asarray(scale, np.float32)
    if args.strategy == "tensor":
        per_elem = np.full_like(w32, s.reshape(()))
    elif args.strategy == "channel":
        per_elem = np.broadcast_to(s.reshape(n, 1), w32.shape)
    elif args.strategy == "group":
        per_elem = s.reshape(n, -1).repeat(args.group_size, 1)
    else:
        bh, bw = args.block_structure
        per_elem = s.repeat(bh, 0).repeat(bw, 1)
    diff = np.abs(out16 - out32)
    assert (diff > per_elem * 1.01).mean() == 0.0  # never beyond one step
    # full-step flips (boundary crossings) must stay rare; sub-step noise
    # is bf16 representation error and unbounded in count
    assert (diff > per_elem * 0.5).mean() < 0.05
