import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from compressed_tensors_tpu.models.synthetic import TINYLLAMA_1_1B, make_synthetic_llama
from compressed_tensors_tpu.models.llama import init_kv_cache, llama_forward
from compressed_tensors_tpu.ops.fuse import fuse_llama_layers
import functools

config = TINYLLAMA_1_1B
batch, prompt_len, steps = 64, 16, 32
max_len = prompt_len + steps + 1
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, config.vocab_size, size=(batch, prompt_len)), dtype=jnp.int32)

def bench(params, tag):
    @jax.jit
    def run(params, input_ids):
        B = input_ids.shape[0]
        cache = init_kv_cache(config, B, max_len, dtype=jnp.bfloat16)
        positions = jnp.broadcast_to(jnp.arange(input_ids.shape[1]), input_ids.shape)
        logits, cache = llama_forward(params, config, input_ids, positions, cache)
        token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        def body(i, carry):
            token, cache, acc = carry
            logits, cache = llama_forward(params, config, token[:, None], cache.lengths[:, None], cache)
            token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return token, cache, acc + jnp.sum(token)
        token, cache, acc = jax.lax.fori_loop(0, steps, body, (token, cache, jnp.int32(0)))
        return acc
    int(run(params, ids))
    times = []
    for _ in range(3):
        t0 = time.perf_counter(); int(run(params, ids)); times.append(time.perf_counter()-t0)
    best = min(times)
    print(f"{tag}: {batch*steps/best:.0f} tok/s (times {[f'{t:.3f}' for t in times]})", flush=True)

p = make_synthetic_llama(config, preset="W4A16", use_kernels=True)
bench(p, "w4a16-kernel-unfused")
bench(fuse_llama_layers(p), "w4a16-kernel-fused")
p2 = make_synthetic_llama(config, preset="W4A16", use_kernels=False)
bench(fuse_llama_layers(p2), "w4a16-xla-fused")
p3 = make_synthetic_llama(config, preset="UNQUANTIZED", use_kernels=False)
bench(fuse_llama_layers(p3), "dense-fused")
