"""Isolate: prefill time vs fori_loop decode time vs python-loop decode."""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from compressed_tensors_tpu.models.synthetic import TINYLLAMA_1_1B, make_synthetic_llama
from compressed_tensors_tpu.models.llama import init_kv_cache, llama_forward
from compressed_tensors_tpu.ops.fuse import fuse_llama_layers

config = TINYLLAMA_1_1B
B, prompt_len, steps = 64, 16, 32
max_len = prompt_len + steps + 1
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, config.vocab_size, size=(B, prompt_len)), dtype=jnp.int32)

params = fuse_llama_layers(make_synthetic_llama(config, preset="W4A16", use_kernels=True))

@jax.jit
def prefill(params, input_ids):
    cache = init_kv_cache(config, B, max_len, dtype=jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(input_ids.shape[1]), input_ids.shape)
    logits, cache = llama_forward(params, config, input_ids, positions, cache,
                                  fresh_prefill=True)
    token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    return token, cache

@jax.jit
def decode_loop(params, token, cache):
    def body(i, carry):
        token, cache, acc = carry
        logits, cache = llama_forward(params, config, token[:, None],
                                      cache.lengths[:, None], cache)
        token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        return token, cache, acc + jnp.sum(token)
    return jax.lax.fori_loop(0, steps, body, (token, cache, jnp.int32(0)))

@jax.jit
def decode_step(params, token, cache):
    logits, cache = llama_forward(params, config, token[:, None],
                                  cache.lengths[:, None], cache)
    return jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32), cache

# compile all
tok, cache = prefill(params, ids)
jax.block_until_ready(decode_loop(params, tok, cache))
jax.block_until_ready(decode_step(params, tok, cache))

t0 = time.perf_counter()
for _ in range(5):
    tok2, cache2 = prefill(params, ids)
jax.block_until_ready(cache2.k)
print(f"prefill (64x16): {(time.perf_counter()-t0)/5*1e3:.2f} ms", flush=True)

t0 = time.perf_counter()
out = decode_loop(params, tok, cache)
jax.block_until_ready(out)
dt = time.perf_counter() - t0
print(f"fori_loop decode x{steps}: {dt*1e3:.1f} ms -> {dt/steps*1e3:.3f} ms/step -> {B*steps/dt:.0f} tok/s", flush=True)

t0 = time.perf_counter()
tk, ch = tok, cache
for _ in range(steps):
    tk, ch = decode_step(params, tk, ch)
jax.block_until_ready(ch.k)
dt = time.perf_counter() - t0
print(f"python-loop decode x{steps}: {dt*1e3:.1f} ms -> {dt/steps*1e3:.3f} ms/step -> {B*steps/dt:.0f} tok/s", flush=True)
