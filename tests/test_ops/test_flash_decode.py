"""Length-aware flash decode kernel vs the block decode kernel and a numpy
reference (interpret mode): attention outputs and in-place cache updates."""


from compressed_tensors_tpu.flags import set_flags

set_flags(pallas_interpret=True)

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from compressed_tensors_tpu.ops.kernels.decode_attention import (
    decode_attention,
)
from compressed_tensors_tpu.ops.kernels.flash_decode import (
    flash_decode_attention,
)

L, B, KVH, REP, DP, SMAX = 2, 4, 2, 4, 128, 128
H = KVH * REP


def _setup(rng, cache_dtype=jnp.float32, lengths=(0, 3, 17, 64)):
    q = jnp.asarray(rng.standard_normal((B, H, DP)), dtype=jnp.float32)
    nk = jnp.asarray(rng.standard_normal((B, KVH, DP)), dtype=jnp.float32)
    nv = jnp.asarray(rng.standard_normal((B, KVH, DP)), dtype=jnp.float32)
    ck = jnp.asarray(
        rng.standard_normal((L, B, KVH, SMAX, DP)), dtype=jnp.float32
    ).astype(cache_dtype)
    cv = jnp.asarray(
        rng.standard_normal((L, B, KVH, SMAX, DP)), dtype=jnp.float32
    ).astype(cache_dtype)
    lens = jnp.asarray(lengths, dtype=jnp.int32)
    return q, nk, nv, ck, cv, lens


def _np_reference(q, nk, nv, ck, cv, lens, layer, k_scale=None, v_scale=None):
    """Numpy GQA decode over the valid prefix + the new token."""
    q, nk, nv = map(lambda a: np.asarray(a, np.float64), (q, nk, nv))
    ks = float(k_scale) if k_scale is not None else 1.0
    vs = float(v_scale) if v_scale is not None else 1.0
    ckl = np.asarray(ck[layer], np.float64) * ks
    cvl = np.asarray(cv[layer], np.float64) * vs
    out = np.zeros((B, H, DP))
    for b, ln in enumerate(np.asarray(lens)):
        if ln < 0:
            continue
        for g in range(KVH):
            keys = np.concatenate([ckl[b, g, :ln], nk[b, g][None]], axis=0)
            vals = np.concatenate([cvl[b, g, :ln], nv[b, g][None]], axis=0)
            for r in range(REP):
                hq = g * REP + r
                s = keys @ q[b, hq] / np.sqrt(DP)
                p = np.exp(s - s.max())
                p /= p.sum()
                out[b, hq] = p @ vals
    return out


def test_flash_matches_numpy(rng):
    q, nk, nv, ck, cv, lens = _setup(rng)
    out, ck2, cv2 = flash_decode_attention(
        q, nk, nv, ck, cv, lens, kvh=KVH, rep=REP, d=DP, layer=1, chunk=32
    )
    want = _np_reference(q, nk, nv, ck, cv, lens, layer=1)
    got = np.asarray(out, np.float64)
    for b, ln in enumerate(np.asarray(lens)):
        if ln >= 0:
            np.testing.assert_allclose(got[b], want[b], atol=1e-3, rtol=1e-3)

    # cache write-back: new token at position len, everything else untouched
    ck2, cv2 = np.asarray(ck2), np.asarray(cv2)
    for b, ln in enumerate(np.asarray(lens)):
        if ln < 0:
            continue
        np.testing.assert_allclose(ck2[1, b, :, ln, :], np.asarray(nk)[b],
                                   atol=1e-6)
        np.testing.assert_allclose(cv2[1, b, :, ln, :], np.asarray(nv)[b],
                                   atol=1e-6)
        mask = np.arange(SMAX) != ln
        np.testing.assert_allclose(ck2[1, b, :, mask, :],
                                   np.asarray(ck)[1, b, :, mask, :])
    # other layers untouched
    np.testing.assert_allclose(ck2[0], np.asarray(ck)[0])


def test_flash_matches_block_kernel(rng):
    q, nk, nv, ck, cv, lens = _setup(rng, lengths=(5, 31, 32, 100))
    out_f, ckf, cvf = flash_decode_attention(
        q, nk, nv, ck, cv, lens, kvh=KVH, rep=REP, d=DP, layer=0, chunk=64
    )
    out_b, ckb, cvb = decode_attention(
        q, nk, nv, ck, cv, lens, kvh=KVH, rep=REP, d=DP, layer=0
    )
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_b),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ckf), np.asarray(ckb))
    np.testing.assert_allclose(np.asarray(cvf), np.asarray(cvb))


def test_flash_inactive_rows_untouched(rng):
    q, nk, nv, ck, cv, lens = _setup(rng, lengths=(-1, 4, -1, 9))
    _, ck2, cv2 = flash_decode_attention(
        q, nk, nv, ck, cv, lens, kvh=KVH, rep=REP, d=DP, layer=0, chunk=32
    )
    for b in (0, 2):
        np.testing.assert_allclose(np.asarray(ck2)[0, b], np.asarray(ck)[0, b])
        np.testing.assert_allclose(np.asarray(cv2)[0, b], np.asarray(cv)[0, b])


def test_flash_fp8_kv_scales(rng):
    cache_dtype = jnp.dtype(ml_dtypes.float8_e4m3fn)
    q, nk, nv, ck, cv, lens = _setup(rng, cache_dtype=cache_dtype,
                                     lengths=(0, 7, 40, 99))
    k_scale = jnp.asarray([0.5], dtype=jnp.float32)
    v_scale = jnp.asarray([0.25], dtype=jnp.float32)
    out, ck2, cv2 = flash_decode_attention(
        q, nk, nv, ck, cv, lens, kvh=KVH, rep=REP, d=DP,
        k_scale=k_scale, v_scale=v_scale, layer=1, chunk=32
    )
    # reference: dequantized cache + exact new token (quantize->dequantize)
    nk_q = (np.asarray(nk, np.float32) / 0.5).astype(
        ml_dtypes.float8_e4m3fn).astype(np.float32) * 0.5
    nv_q = (np.asarray(nv, np.float32) / 0.25).astype(
        ml_dtypes.float8_e4m3fn).astype(np.float32) * 0.25
    want = _np_reference(q, nk_q, nv_q, np.asarray(ck, np.float32) ,
                         np.asarray(cv, np.float32), lens, layer=1,
                         k_scale=0.5, v_scale=0.25)
    got = np.asarray(out, np.float64)
    for b, ln in enumerate(np.asarray(lens)):
        if ln >= 0:
            np.testing.assert_allclose(got[b], want[b], atol=5e-2, rtol=5e-2)
