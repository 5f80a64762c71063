"""Continuous-batching engine: slot lifecycle, consistency with plain
greedy decoding, mid-flight admission."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
from testing_utils import make_tiny_llama_checkpoint  # noqa: E402

from compressed_tensors_tpu.engine import (  # noqa: E402
    Request,
    ServingEngine,
    greedy_generate,
)
from compressed_tensors_tpu.models import load_llama_params  # noqa: E402

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
    "quantization_status": "frozen",
}


def _engine(rng, tmp_path, **kwargs):
    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, W4A16_G32)
    params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                          dtype=jnp.float32)
    engine = ServingEngine(params, config, dtype=jnp.float32, **kwargs)
    return engine, params, config


def test_single_request_matches_greedy(rng, tmp_path):
    engine, params, config = _engine(rng, tmp_path, max_batch=2, max_len=32,
                                     prefill_chunk=4)
    prompt = rng.integers(0, config.vocab_size, size=(6,)).tolist()

    engine.submit(Request(request_id=0, prompt_ids=prompt, max_new_tokens=5))
    completions = engine.run()
    assert len(completions) == 1
    out = completions[0]
    assert out.finish_reason == "length"
    assert len(out.output_ids) == 5

    ref = greedy_generate(params, config,
                          np.asarray(prompt, dtype=np.int32)[None, :],
                          max_new_tokens=5, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(out.output_ids), np.asarray(ref[0, 6:])
    )


def test_concurrent_requests(rng, tmp_path):
    engine, params, config = _engine(rng, tmp_path, max_batch=3, max_len=32,
                                     prefill_chunk=4)
    prompts = [
        rng.integers(0, config.vocab_size, size=(n,)).tolist()
        for n in (4, 6, 3, 5)  # 4 requests > 3 slots: exercises refill
    ]
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=i, prompt_ids=p, max_new_tokens=4))
    completions = engine.run()
    assert sorted(c.request_id for c in completions) == [0, 1, 2, 3]
    assert all(len(c.output_ids) == 4 for c in completions)

    # each sequence matches the isolated greedy run
    by_id = {c.request_id: c for c in completions}
    for i, p in enumerate(prompts):
        ref = greedy_generate(params, config,
                              np.asarray(p, dtype=np.int32)[None, :],
                              max_new_tokens=4, dtype=jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(by_id[i].output_ids),
            np.asarray(ref[0, len(p):]),
            err_msg=f"request {i}",
        )


def test_eos_stops_generation(rng, tmp_path):
    engine, params, config = _engine(rng, tmp_path, max_batch=1, max_len=32)
    prompt = rng.integers(0, config.vocab_size, size=(4,)).tolist()

    # find which token greedy emits first, then use it as EOS
    ref = greedy_generate(params, config,
                          np.asarray(prompt, dtype=np.int32)[None, :],
                          max_new_tokens=1, dtype=jnp.float32)
    eos = int(ref[0, 4])

    engine.submit(Request(request_id=0, prompt_ids=prompt,
                          max_new_tokens=10, eos_token_id=eos))
    completions = engine.run()
    assert completions[0].finish_reason == "stop"
    assert completions[0].output_ids[-1] == eos
    assert len(completions[0].output_ids) == 1


def test_burst_decode_matches_per_step(rng, tmp_path):
    """steps_per_sync>1 (lax.scan burst) yields identical completions."""
    engine1, params, config = _engine(rng, tmp_path, max_batch=2, max_len=32,
                                      prefill_chunk=4)
    engine4 = ServingEngine(params, config, dtype=jnp.float32, max_batch=2,
                            max_len=32, prefill_chunk=4, steps_per_sync=4)
    prompts = [rng.integers(0, config.vocab_size, size=(n,)).tolist()
               for n in (6, 3, 9)]
    for e in (engine1, engine4):
        for i, p in enumerate(prompts):
            e.submit(Request(request_id=i, prompt_ids=p, max_new_tokens=7))
    outs1 = {c.request_id: c.output_ids for c in engine1.run()}
    outs4 = {c.request_id: c.output_ids for c in engine4.run()}
    assert outs1.keys() == outs4.keys()
    for rid in outs1:
        assert outs1[rid] == outs4[rid], rid


def test_burst_decode_eos_truncation(rng, tmp_path):
    """A slot finishing on EOS mid-burst truncates tokens generated past it
    and still matches the per-step engine."""
    engine1, params, config = _engine(rng, tmp_path, max_batch=1, max_len=32,
                                      prefill_chunk=4)
    engine8 = ServingEngine(params, config, dtype=jnp.float32, max_batch=1,
                            max_len=32, prefill_chunk=4, steps_per_sync=8)
    prompt = rng.integers(0, config.vocab_size, size=(5,)).tolist()
    # pick the 3rd greedily generated token as the EOS so it hits mid-burst
    ref = greedy_generate(params, config,
                          np.asarray(prompt, dtype=np.int32)[None, :],
                          max_new_tokens=8, dtype=jnp.float32)
    eos = int(np.asarray(ref)[0, 5 + 2])
    for e in (engine1, engine8):
        e.submit(Request(request_id=0, prompt_ids=prompt, max_new_tokens=8,
                         eos_token_id=eos))
    (c1,), (c8,) = engine1.run(), engine8.run()
    assert c1.output_ids == c8.output_ids
    assert c8.finish_reason == c1.finish_reason


def test_paged_engine_matches_dense(rng, tmp_path):
    """Paged engine (page pool + tables, pool sized for oversubscription
    pressure) produces identical completions to the dense-slab engine,
    including slot recycling/page reuse across sequential requests."""
    engine, params, config = _engine(
        rng, tmp_path, max_batch=2, max_len=32, prefill_chunk=4,
        paged=True, page_size=8, num_pages=2 * 4 + 2,
    )
    dense, _, _ = _engine(rng, tmp_path, max_batch=2, max_len=32,
                          prefill_chunk=4)
    # reuse the SAME params so logits match exactly
    dense.params = engine.params

    prompts = [rng.integers(0, config.vocab_size, size=(n,)).tolist()
               for n in (6, 3, 9, 5)]
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=i, prompt_ids=p, max_new_tokens=6))
        dense.submit(Request(request_id=i, prompt_ids=p, max_new_tokens=6))

    got = {c.request_id: c.output_ids for c in engine.run()}
    ref = {c.request_id: c.output_ids for c in dense.run()}
    assert set(got) == {0, 1, 2, 3}
    for rid in ref:
        assert got[rid] == ref[rid], rid
    # all pages returned to the pool (free list or reusable prefix LRU)
    assert (len(engine._free_pages) + len(engine._cached_free)
            == engine.cache.k.shape[1] - 1)
    assert not engine._page_ref


def test_paged_pool_exhaustion_raises(rng, tmp_path):
    engine, _, config = _engine(
        rng, tmp_path, max_batch=2, max_len=32, prefill_chunk=4,
        paged=True, page_size=8, num_pages=2,  # 1 usable page
    )
    engine.submit(Request(
        request_id=0,
        prompt_ids=rng.integers(0, config.vocab_size, size=(12,)).tolist(),
        max_new_tokens=4,
    ))
    import pytest

    with pytest.raises(RuntimeError, match="pool exhausted"):
        engine.run()


def test_paged_preemption_oversubscribed(rng, tmp_path):
    """A pool too small for both sequences at full length preempts the
    newest slot (pages freed, request requeued with its generated prefix)
    and still completes every request with exactly the dense engine's
    outputs."""
    engine, params, config = _engine(
        rng, tmp_path, max_batch=2, max_len=32, prefill_chunk=8,
        paged=True, page_size=8, num_pages=5,  # 4 usable < 2 * 3 needed
    )
    dense, _, _ = _engine(rng, tmp_path, max_batch=2, max_len=32,
                          prefill_chunk=8)
    dense.params = engine.params

    prompts = [rng.integers(0, config.vocab_size, size=(10,)).tolist()
               for _ in range(2)]
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=i, prompt_ids=p, max_new_tokens=12))
        dense.submit(Request(request_id=i, prompt_ids=p, max_new_tokens=12))
    got = {c.request_id: c.output_ids for c in engine.run()}
    ref = {c.request_id: c.output_ids for c in dense.run()}
    assert engine.preemptions >= 1
    assert set(got) == {0, 1}
    for rid in ref:
        assert got[rid] == ref[rid], rid
    # no page leaked
    assert (len(engine._free_pages) + len(engine._cached_free)
            + len(engine._page_ref) == 4)


def test_submit_clamps_max_new_tokens(rng, tmp_path):
    """max_new_tokens >= max_len is clamped at submit so prompt truncation
    and the capacity invariant stay well-defined (ADVICE r2)."""
    engine, params, config = _engine(rng, tmp_path, max_batch=1, max_len=16)
    prompt = rng.integers(0, config.vocab_size, size=(6,)).tolist()
    engine.submit(Request(request_id=0, prompt_ids=prompt,
                          max_new_tokens=999))
    (c,) = engine.run()
    assert c.finish_reason == "length"
    assert len(c.output_ids) <= 15
    assert int(np.asarray(engine.cache.lengths)[0]) < 16


def test_prefix_caching_reuses_pages_and_matches(rng, tmp_path):
    """Second request with a shared prompt prefix reuses cached pages
    (prefill skips them) and still produces exactly the dense engine's
    output."""
    engine, params, config = _engine(
        rng, tmp_path, max_batch=2, max_len=64, prefill_chunk=8,
        paged=True, page_size=8,
    )
    dense, _, _ = _engine(rng, tmp_path, max_batch=2, max_len=64,
                          prefill_chunk=8)
    dense.params = engine.params

    shared = rng.integers(0, config.vocab_size, size=(17,)).tolist()
    tails = [rng.integers(0, config.vocab_size, size=(n,)).tolist()
             for n in (3, 5)]
    # run sequentially so request 1 admits after request 0 registered
    outs, ref_outs = [], []
    for i, tail in enumerate(tails):
        engine.submit(Request(request_id=i, prompt_ids=shared + tail,
                              max_new_tokens=4))
        outs += engine.run()
        dense.submit(Request(request_id=i, prompt_ids=shared + tail,
                             max_new_tokens=4))
        ref_outs += dense.run()

    # 17+tail tokens at page 8 -> 2 full shared pages cached and reused
    assert engine.prefix_cache_hits == 2
    got = {c.request_id: c.output_ids for c in outs}
    ref = {c.request_id: c.output_ids for c in ref_outs}
    for rid in ref:
        assert got[rid] == ref[rid], rid


def test_prefix_cache_identical_prompt_exact_pages(rng, tmp_path):
    """Prompt length an exact page multiple, submitted twice: all but the
    last page reuse (>=1 token is always recomputed for its logits)."""
    engine, params, config = _engine(
        rng, tmp_path, max_batch=1, max_len=64, prefill_chunk=8,
        paged=True, page_size=8,
    )
    prompt = rng.integers(0, config.vocab_size, size=(24,)).tolist()
    engine.submit(Request(request_id=0, prompt_ids=prompt, max_new_tokens=3))
    first = engine.run()[0].output_ids
    engine.submit(Request(request_id=1, prompt_ids=prompt, max_new_tokens=3))
    second = engine.run()[0].output_ids
    assert engine.prefix_cache_hits == 2  # pages 0,1 of 3 (last recomputed)
    assert first == second


def test_prefix_cache_eviction_under_pressure(rng, tmp_path):
    """A tight pool evicts LRU cached pages instead of failing, and
    evicted prefixes simply re-prefill."""
    engine, params, config = _engine(
        rng, tmp_path, max_batch=1, max_len=32, prefill_chunk=8,
        paged=True, page_size=8, num_pages=5,  # 4 usable pages
    )
    a = rng.integers(0, config.vocab_size, size=(17,)).tolist()
    b = rng.integers(0, config.vocab_size, size=(17,)).tolist()
    for rid, p in [(0, a), (1, b), (2, a)]:
        engine.submit(Request(request_id=rid, prompt_ids=p,
                              max_new_tokens=3))
        engine.run()
    # b's prefill (3 pages needed, 4-page pool with 2 cached from a)
    # evicted at least one of a's pages; the engine stayed correct and
    # kept serving. No page leaked:
    total = (len(engine._free_pages) + len(engine._cached_free)
             + len(engine._page_ref))
    assert total == 4
