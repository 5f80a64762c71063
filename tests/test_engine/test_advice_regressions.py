"""Regression tests for the round-3 advisor findings (ADVICE.md r3):

1. paged-pool preemption livelock — when the only active slot cannot cover
   its decode burst, the engine shrinks the burst instead of self-
   preempting forever, and raises loudly when even burst=1 cannot fit;
2. make_step_fns prefill with a padded prompt samples at the last REAL
   position;
3. submit() never mutates the caller's Request when clamping budgets.
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from testing_utils import make_tiny_llama_checkpoint  # noqa: E402

from compressed_tensors_tpu.engine import Request, ServingEngine  # noqa: E402
from compressed_tensors_tpu.engine.generate import make_step_fns  # noqa: E402
from compressed_tensors_tpu.models import load_llama_params  # noqa: E402

W4A16_G32 = {
    "config_groups": {
        "group_0": {
            "targets": ["Linear"],
            "weights": {"num_bits": 4, "type": "int", "symmetric": True,
                        "strategy": "group", "group_size": 32},
        }
    },
    "format": "pack-quantized",
    "ignore": ["lm_head"],
    "quant_method": "compressed-tensors",
    "quantization_status": "frozen",
}


@pytest.fixture(scope="module")
def model(rng_module, tmp_path_factory):
    save_dir, _ = make_tiny_llama_checkpoint(
        tmp_path_factory.mktemp("ckpt"), rng_module, W4A16_G32)
    params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                          dtype=jnp.float32)
    return params, config


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(0)


def test_single_slot_burst_shrinks_instead_of_livelock(model, rng_module):
    """One active slot + a pool exactly covering length+1: a burst > 1
    must shrink to 1 and the request must still complete (the r3 engine
    looped prefill/self-preempt with zero token progress)."""
    params, config = model
    # pool: null page + 3 pages of 8 = 24 positions for one slot
    engine = ServingEngine(params, config, dtype=jnp.float32, max_batch=1,
                           max_len=32, prefill_chunk=8, paged=True,
                           page_size=8, num_pages=4, prefix_caching=False,
                           steps_per_sync=8)
    prompt = rng_module.integers(0, config.vocab_size, 14).tolist()
    engine.submit(Request(request_id=0, prompt_ids=prompt,
                          max_new_tokens=8))
    done = engine.run(max_steps=50)
    assert len(done) == 1
    assert len(done[0].output_ids) == 8
    # no self-preemption churn
    assert engine.preemptions == 0


def test_last_slot_raises_when_even_one_write_cannot_fit(model, rng_module):
    """If the last active sequence cannot cover its next decode write the
    engine raises instead of silently spinning."""
    params, config = model
    # pool: null page + 2 pages of 8 = 16 positions; prompt 15 fills them
    engine = ServingEngine(params, config, dtype=jnp.float32, max_batch=1,
                           max_len=32, prefill_chunk=8, paged=True,
                           page_size=8, num_pages=3, prefix_caching=False,
                           steps_per_sync=4)
    prompt = rng_module.integers(0, config.vocab_size, 15).tolist()
    engine.submit(Request(request_id=0, prompt_ids=prompt,
                          max_new_tokens=8))
    with pytest.raises(RuntimeError, match="paged KV pool exhausted"):
        engine.run(max_steps=50)


def test_submit_does_not_mutate_caller_request(model):
    params, config = model
    engine = ServingEngine(params, config, dtype=jnp.float32, max_batch=1,
                           max_len=16)
    req = Request(request_id=0, prompt_ids=[1, 2, 3], max_new_tokens=999)
    engine.submit(req)
    assert req.max_new_tokens == 999  # caller's object untouched
    assert engine.queue[0].max_new_tokens == 15  # clamped internal copy


def test_padded_prompt_prefill_samples_last_real_position(model,
                                                          rng_module):
    """prompt_len < input_ids.shape[1]: the sampled token must come from
    logits at prompt_len-1, not the padded final position."""
    params, config = model
    prompt_len, padded = 5, 8
    ids = rng_module.integers(0, config.vocab_size, padded).astype(np.int32)
    prefill, _ = make_step_fns(config, max_len=padded + 4,
                               dtype=jnp.float32)

    token_padded, _, logits = prefill(
        params, jnp.asarray(ids)[None, :], prompt_len)
    expect = int(np.argmax(np.asarray(logits)[0, prompt_len - 1]))
    assert int(token_padded[0]) == expect
