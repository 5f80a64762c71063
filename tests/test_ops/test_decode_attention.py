"""Fused decode-attention kernel vs the jnp attention path (interpret
mode): logits parity for bf16 and fp8-quantized KV caches."""

import sys
from pathlib import Path

from compressed_tensors_tpu.flags import set_flags

set_flags(pallas_interpret=True)

import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from testing_utils import make_tiny_llama_checkpoint  # noqa: E402

from compressed_tensors_tpu.models import (  # noqa: E402
    init_kv_cache,
    llama_forward,
    load_llama_params,
)

W4A16_G32 = {
    "config_groups": {
        "group_0": {
            "targets": ["Linear"],
            "weights": {"num_bits": 4, "type": "int", "strategy": "group",
                        "group_size": 32, "symmetric": True},
        }
    },
    "format": "pack-quantized",
    "ignore": ["lm_head"],
    "quant_method": "compressed-tensors",
}


def _setup(rng, tmp_path, kv_scales=False):
    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, W4A16_G32,
                                             kv_scales=kv_scales)
    return load_llama_params(save_dir, run_compressed=True, dtype=jnp.float32)


def _decode_logits(params, config, ids, cache_dtype=None, fused=True,
                   head_pack=None):
    """Prefill then 3 decode steps; returns stacked decode logits."""
    B, S = ids.shape
    cache = init_kv_cache(config, B, S + 3, dtype=jnp.float32,
                          cache_dtype=cache_dtype, head_pack=head_pack)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))

    logits, cache = llama_forward(params, config, jnp.asarray(ids),
                                  positions, cache, use_kernels=fused)
    outs = []
    tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    for _ in range(3):
        logits, cache = llama_forward(
            params, config, tok[:, None], cache.lengths[:, None], cache,
            use_kernels=fused,
        )
        outs.append(np.asarray(logits[:, 0], np.float32))
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    return np.stack(outs)


def test_fused_decode_matches_jnp(rng, tmp_path):
    params, config, _ = _setup(rng, tmp_path)
    ids = rng.integers(0, config.vocab_size, size=(2, 5))
    fused = _decode_logits(params, config, ids, fused=True)
    eager = _decode_logits(params, config, ids, fused=False)
    np.testing.assert_allclose(fused, eager, atol=2e-3, rtol=1e-2)


def test_fused_decode_fp8_kv(rng, tmp_path):
    params, config, _ = _setup(rng, tmp_path, kv_scales=True)
    assert "k_scale" in params["layers"][0]
    ids = rng.integers(0, config.vocab_size, size=(1, 5))
    cache_dtype = jnp.dtype(ml_dtypes.float8_e4m3fn)
    fused = _decode_logits(params, config, ids, cache_dtype=cache_dtype,
                           fused=True)
    eager = _decode_logits(params, config, ids, cache_dtype=cache_dtype,
                           fused=False)
    np.testing.assert_allclose(fused, eager, atol=5e-2, rtol=5e-2)


def test_fused_decode_fp8_kv_per_head(rng, tmp_path):
    """attn_head-strategy head-shaped (KVH, 1, 1) k/v scales: the block
    decode kernel quantizes/dequantizes per head and matches the eager
    path (ref initialize_attn_qparams, initialize.py:279-334)."""
    params, config, _ = _setup(rng, tmp_path, kv_scales="per_head")
    ks = params["layers"][0]["k_scale"]
    assert ks.shape == (config.num_key_value_heads, 1, 1)
    assert len(np.unique(np.asarray(ks))) > 1  # genuinely per-head
    ids = rng.integers(0, config.vocab_size, size=(2, 5))
    cache_dtype = jnp.dtype(ml_dtypes.float8_e4m3fn)
    # head_pack=False: per-head scales cannot vary along lanes, so the
    # fused kernel requires the unpacked one-head-per-row layout
    fused = _decode_logits(params, config, ids, cache_dtype=cache_dtype,
                           fused=True, head_pack=False)
    eager = _decode_logits(params, config, ids, cache_dtype=cache_dtype,
                           fused=False, head_pack=False)
    np.testing.assert_allclose(fused, eager, atol=5e-2, rtol=5e-2)


def test_head_packed_cache_matches_unpacked(rng, tmp_path):
    """Head-packed KV layout (P adjacent heads per 128-lane row): fused
    decode over the packed cache matches the unpacked layout bit-for-value,
    for both the kernel and the jnp path."""
    params, config, _ = _setup(rng, tmp_path)
    assert config.head_dim <= 64  # packing active by default
    ids = rng.integers(0, config.vocab_size, size=(2, 5))
    packed_fused = _decode_logits(params, config, ids, fused=True)
    unpacked_fused = _decode_logits(params, config, ids, fused=True,
                                    head_pack=False)
    packed_eager = _decode_logits(params, config, ids, fused=False)
    np.testing.assert_allclose(packed_fused, unpacked_fused,
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(packed_fused, packed_eager,
                               atol=2e-3, rtol=1e-2)


def test_multi_row_programs_mixed_lengths(rng):
    """Direct kernel test at B=16 (multi-row programs): varying lengths,
    inactive (negative-length) rows leave the cache untouched."""
    from compressed_tensors_tpu.ops.kernels.decode_attention import (
        decode_attention,
    )

    B, KVH, REP, S, D = 16, 2, 4, 24, 128
    H = KVH * REP
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    nk = jnp.asarray(rng.standard_normal((B, KVH, D)), jnp.float32)
    nv = jnp.asarray(rng.standard_normal((B, KVH, D)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((B, KVH, S, D)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((B, KVH, S, D)), jnp.float32)
    lens = jnp.asarray(
        [5, -1, 0, 7, 3, 9, -1, 1, 8, 2, 6, 4, -1, 10, 11, 12], jnp.int32
    )

    out, ck2, cv2 = decode_attention(q, nk, nv, ck, cv, lens, kvh=KVH,
                                     rep=REP, d=D)

    ck0, cv0 = np.asarray(ck), np.asarray(cv)
    for b in range(B):
        ln = int(lens[b])
        if ln < 0:
            np.testing.assert_array_equal(np.asarray(ck2)[b], ck0[b])
            np.testing.assert_array_equal(np.asarray(cv2)[b], cv0[b])
            continue
        # cache row at position `ln` now holds the new token
        np.testing.assert_allclose(np.asarray(ck2)[b, :, ln],
                                   np.asarray(nk)[b], rtol=1e-6)
        # reference attention over the valid prefix (post-append)
        keys = np.asarray(ck2)[b]      # (KVH, S, D)
        vals = np.asarray(cv2)[b]
        for hh in range(H):
            g = hh // REP
            s = (np.asarray(q)[b, hh] @ keys[g, : ln + 1].T) / np.sqrt(D)
            p = np.exp(s - s.max())
            p /= p.sum()
            expect = p @ vals[g, : ln + 1]
            np.testing.assert_allclose(np.asarray(out)[b, hh], expect,
                                       atol=1e-4, rtol=1e-4)
