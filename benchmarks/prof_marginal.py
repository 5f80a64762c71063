"""Marginal decode-step cost via (T(n2) - T(n1)) / (n2 - n1), cancelling the
per-dispatch tunnel overhead. One compile: nsteps is traced (while_loop)."""
import os, sys, time
sys.path.insert(0, '/root/repo')
layout = sys.argv[1] if len(sys.argv) > 1 else "auto"
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from compressed_tensors_tpu.flags import set_flags
set_flags(w4_layout=layout)
from compressed_tensors_tpu.models.synthetic import TINYLLAMA_1_1B, make_synthetic_llama
from compressed_tensors_tpu.models.llama import init_kv_cache, llama_forward
from compressed_tensors_tpu.ops.fuse import fuse_llama_layers

config = TINYLLAMA_1_1B
B, prompt_len = 64, 16
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, config.vocab_size, size=(B, prompt_len)), dtype=jnp.int32)
preset = sys.argv[2] if len(sys.argv) > 2 else "W4A16"
dense = preset == "UNQUANTIZED"
params = fuse_llama_layers(make_synthetic_llama(config, preset=preset,
                                                use_kernels=not dense))
qkv = params["layers"][0].get("qkv_proj")
if qkv is not None and qkv.kernel_meta:
    print(f"layer kernel_meta: {qkv.kernel_meta}", flush=True)

MAXLEN = prompt_len + 64 + 1

@jax.jit
def run(params, input_ids, nsteps):
    cache = init_kv_cache(config, B, MAXLEN, dtype=jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(input_ids.shape[1]), input_ids.shape)
    logits, cache = llama_forward(params, config, input_ids, positions, cache, fresh_prefill=True)
    token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    def cond(carry):
        i, *_ = carry
        return i < nsteps
    def body(carry):
        i, token, cache, acc = carry
        logits, cache = llama_forward(params, config, token[:, None],
                                      cache.lengths[:, None], cache)
        token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        return i + 1, token, cache, acc + jnp.sum(token)
    _, token, cache, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), token, cache, jnp.int32(0)))
    return acc

def t(nsteps):
    int(run(params, ids, nsteps))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        int(run(params, ids, nsteps))
        best = min(best, time.perf_counter() - t0)
    return best

t8, t64 = t(8), t(64)
marg = (t64 - t8) / 56
print(f"layout={layout} preset={preset}: T(8)={t8*1e3:.1f}ms T(64)={t64*1e3:.1f}ms "
      f"marginal={marg*1e3:.3f} ms/step -> {B/marg:.0f} tok/s marginal", flush=True)
