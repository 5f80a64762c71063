"""Paged KV cache: prefill + decode logits parity with the dense per-slot
cache (interpret mode), with shuffled page tables to prove the
indirection. Covers the paged_decode kernel and the gather/scatter paged
prefill path."""

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
    PagedKVCache,
    init_kv_cache,
    init_paged_kv_cache,
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


def _shuffled_tables(rng, batch, p_max, num_pages):
    """Distinct non-null pages per (row, slot), shuffled across the pool."""
    ids = rng.permutation(np.arange(1, num_pages))[: batch * p_max]
    return jnp.asarray(ids.reshape(batch, p_max), jnp.int32)


def _run(params, config, ids, steps, cache):
    B, S = ids.shape
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    logits, cache = llama_forward(params, config, jnp.asarray(ids),
                                  positions, cache, fresh_prefill=False)
    outs = [np.asarray(logits[:, -1], np.float32)]
    tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    for _ in range(steps):
        logits, cache = llama_forward(
            params, config, tok[:, None], cache.lengths[:, None], cache
        )
        outs.append(np.asarray(logits[:, 0], np.float32))
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    return np.stack(outs)


@pytest.mark.parametrize("kv_scales", [False, True])
def test_paged_matches_dense(rng, tmp_path, kv_scales):
    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, W4A16_G32,
                                             kv_scales=kv_scales)
    params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                          dtype=jnp.float32)
    cache_dtype = (jnp.dtype(ml_dtypes.float8_e4m3fn) if kv_scales else None)

    B, S, steps = 2, 5, 3
    # page size 8 so the sequence spans multiple pages (5 + 4 tokens -> 2)
    max_len = S + steps + 1
    ids = rng.integers(0, config.vocab_size, size=(B, S))

    dense = init_kv_cache(config, B, max_len, dtype=jnp.float32,
                          cache_dtype=cache_dtype)
    ref = _run(params, config, ids, steps, dense)

    paged = init_paged_kv_cache(config, B, max_len, page_size=8,
                                num_pages=B * 2 + 3, dtype=jnp.float32,
                                cache_dtype=cache_dtype)
    p_max = paged.tables.shape[1]
    tables = _shuffled_tables(rng, B, p_max, paged.k.shape[1])
    paged = PagedKVCache(k=paged.k, v=paged.v, tables=tables,
                         lengths=paged.lengths)
    got = _run(params, config, ids, steps, paged)

    tol = 5e-2 if kv_scales else 2e-3
    np.testing.assert_allclose(got, ref, atol=tol, rtol=tol)


def test_paged_inactive_rows_leave_pool_untouched(rng, tmp_path):
    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, W4A16_G32)
    params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                          dtype=jnp.float32)
    B = 2
    paged = init_paged_kv_cache(config, B, 16, page_size=8,
                                dtype=jnp.float32)
    tables = _shuffled_tables(rng, B, paged.tables.shape[1],
                              paged.k.shape[1])
    # row 1 inactive (sentinel -1); row 0 decodes one token at position 0
    lengths = jnp.asarray([0, -1], jnp.int32)
    cache = PagedKVCache(k=paged.k, v=paged.v, tables=tables,
                         lengths=lengths)
    tok = jnp.asarray([[3], [5]], jnp.int32)
    _, cache2 = llama_forward(params, config, tok, lengths[:, None], cache)
    # row 1's pages are bit-identical zeros
    for pid in np.asarray(tables[1]):
        np.testing.assert_array_equal(np.asarray(cache2.k)[:, pid], 0.0)
        np.testing.assert_array_equal(np.asarray(cache2.v)[:, pid], 0.0)
    # row 0's first page holds the new K at position 0
    p0 = int(tables[0, 0])
    assert np.abs(np.asarray(cache2.k)[:, p0, :, 0, :]).max() > 0
