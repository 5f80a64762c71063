"""Attention cost scaling: per-step marginal cost vs S_pad and vs batch.
Flat-in-S_pad => grid/program-overhead bound; linear => DMA/MXU bound."""
import os, sys, time, functools
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from compressed_tensors_tpu.models.synthetic import TINYLLAMA_1_1B
from compressed_tensors_tpu.models.llama import init_kv_cache
from compressed_tensors_tpu.ops.kernels.decode_attention import decode_attention

config = TINYLLAMA_1_1B
H, KVH, D = 32, 4, 64
L = config.num_hidden_layers

def marginal(fn, lo=8, hi=64):
    int(fn(jnp.int32(lo)))
    def t(n):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); int(fn(jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(hi) - t(lo)) / (hi - lo)

for B, MAXLEN in [(64, 40), (64, 88), (64, 176), (32, 88), (128, 88)]:
    cache0 = init_kv_cache(config, B, MAXLEN, dtype=jnp.bfloat16)
    Dp = cache0.k.shape[-1]

    @jax.jit
    def attn_loop(cache0, nsteps, B=B, Dp=Dp):
        q = jnp.ones((B, H, Dp), dtype=jnp.bfloat16) * 0.01
        nk = jnp.ones((B, KVH, Dp), dtype=jnp.bfloat16) * 0.01
        def body(carry):
            i, ck, cv, acc = carry
            lens = jnp.full((B,), 16, dtype=jnp.int32) + i
            out = None
            for li in range(L):
                out, ck, cv = decode_attention(q, nk, nk, ck, cv, lens,
                                               kvh=KVH, rep=H // KVH, d=Dp,
                                               true_d=D, layer=li)
            return i + 1, ck, cv, acc + jnp.sum(out)
        _, ck, cv, acc = jax.lax.while_loop(lambda c: c[0] < nsteps, body,
                                            (jnp.int32(0), cache0.k, cache0.v,
                                             jnp.float32(0)))
        return acc
    ms = marginal(functools.partial(attn_loop, cache0)) * 1e3
    print(f"B={B:4d} S_pad={MAXLEN:4d}: {ms:.3f} ms/step "
          f"({ms/L*1000:.2f} us/layer, {ms/L/B*1000:.3f} us/row)", flush=True)
