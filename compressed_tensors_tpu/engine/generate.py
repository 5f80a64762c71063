"""Decode loop: jitted prefill + single-token decode steps over a static
KV cache. (Continuous batching / paged attention land on top of this.)"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from compressed_tensors_tpu.models.config import LlamaConfig
from compressed_tensors_tpu.models.llama import (
    init_kv_cache,
    llama_forward,
)

__all__ = ["greedy_generate", "make_step_fns"]


def make_step_fns(config: LlamaConfig, max_len: int, dtype=jnp.bfloat16,
                  cache_dtype=None, use_kernels=None):
    """Build jitted (prefill, decode) functions with a fixed cache size.

    :param use_kernels: static Pallas-kernel-path switch baked into the
        jitted steps (None = environment/backend default at trace time).
    """

    @partial(jax.jit, static_argnames=("prompt_len",))
    def prefill(params, input_ids, prompt_len: int):
        B = input_ids.shape[0]
        cache = init_kv_cache(config, B, max_len, dtype=dtype,
                              cache_dtype=cache_dtype)
        positions = jnp.broadcast_to(
            jnp.arange(input_ids.shape[1]), input_ids.shape
        )
        # unpadded prompt: only the last position's logits matter, so skip
        # the other S-1 lm_head rows entirely. Padded prompt (prompt_len <
        # S): sample at the final *real* position, not the padding.
        unpadded = prompt_len == input_ids.shape[1]
        logits, cache = llama_forward(params, config, input_ids, positions,
                                      cache, fresh_prefill=True,
                                      use_kernels=use_kernels,
                                      last_logit_only=unpadded)
        last = -1 if unpadded else prompt_len - 1
        next_token = jnp.argmax(logits[:, last, :], axis=-1)
        return next_token.astype(jnp.int32), cache, logits

    @partial(jax.jit, donate_argnames=("cache",))
    def decode(params, token, cache):
        B = token.shape[0]
        positions = cache.lengths[:, None]
        logits, cache = llama_forward(
            params, config, token[:, None], positions, cache,
            use_kernels=use_kernels,
        )
        next_token = jnp.argmax(logits[:, -1, :], axis=-1)
        return next_token.astype(jnp.int32), cache

    return prefill, decode


def greedy_generate(
    params,
    config: LlamaConfig,
    input_ids,
    max_new_tokens: int = 32,
    dtype=jnp.bfloat16,
    cache_dtype=None,
    eos_token_id: int | None = None,
    use_kernels: bool | None = None,
):
    """Greedy decode. input_ids: (B, S) int32. Returns (B, S + new) ids."""
    input_ids = jnp.asarray(input_ids, dtype=jnp.int32)
    B, S = input_ids.shape
    max_len = S + max_new_tokens
    prefill, decode = make_step_fns(config, max_len, dtype=dtype,
                                    cache_dtype=cache_dtype,
                                    use_kernels=use_kernels)

    token, cache, _ = prefill(params, input_ids, S)
    out = [token]
    for _ in range(max_new_tokens - 1):
        token, cache = decode(params, token, cache)
        out.append(token)
        if eos_token_id is not None and bool((token == eos_token_id).all()):
            break
    generated = jnp.stack(out, axis=1)
    return jnp.concatenate([input_ids, generated], axis=1)
