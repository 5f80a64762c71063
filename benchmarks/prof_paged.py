"""Paged vs flash vs block decode attention at serving-scale allocation."""
import os, sys, time, functools
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from compressed_tensors_tpu.models.synthetic import TINYLLAMA_1_1B
from compressed_tensors_tpu.models.llama import init_kv_cache, init_paged_kv_cache, PagedKVCache
from compressed_tensors_tpu.ops.kernels.decode_attention import decode_attention
from compressed_tensors_tpu.ops.kernels.flash_decode import flash_decode_attention
from compressed_tensors_tpu.ops.kernels.paged_decode import paged_decode_attention

config = TINYLLAMA_1_1B
H, KVH, D = 32, 4, 64
L = config.num_hidden_layers
B, SPAD, LEN = 64, 1024, 100

def marginal(fn, lo=8, hi=64):
    int(fn(jnp.int32(lo)))
    def t(n):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); int(fn(jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(hi) - t(lo)) / (hi - lo)

cache0 = init_kv_cache(config, B, SPAD, dtype=jnp.bfloat16)
Dp = cache0.k.shape[-1]
q = jnp.ones((B, H, Dp), jnp.bfloat16) * 0.01
nk = jnp.ones((B, KVH, Dp), jnp.bfloat16) * 0.01

def loop(attn, carry_init):
    @jax.jit
    def f(nsteps):
        def body(carry):
            i, ck, cv, acc = carry
            lens = jnp.full((B,), LEN, jnp.int32) + i
            out = None
            for li in range(L):
                out, ck, cv = attn(ck, cv, lens, li)
            return i + 1, ck, cv, acc + jnp.sum(out)
        _, _, _, acc = jax.lax.while_loop(lambda c: c[0] < nsteps, body,
                                          (jnp.int32(0), *carry_init, jnp.float32(0)))
        return acc
    return f

blk = loop(lambda ck, cv, lens, li: decode_attention(q, nk, nk, ck, cv, lens,
            kvh=KVH, rep=H//KVH, d=Dp, true_d=D, layer=li), (cache0.k, cache0.v))
print(f"block  S_pad={SPAD}: {marginal(blk)*1e3:.3f} ms/step", flush=True)

fl = loop(lambda ck, cv, lens, li: flash_decode_attention(q, nk, nk, ck, cv, lens,
            kvh=KVH, rep=H//KVH, d=Dp, true_d=D, layer=li), (cache0.k, cache0.v))
print(f"flash  S_pad={SPAD}: {marginal(fl)*1e3:.3f} ms/step", flush=True)

paged = init_paged_kv_cache(config, B, SPAD, page_size=64, dtype=jnp.bfloat16)
P = paged.tables.shape[1]
rng = np.random.default_rng(0)
ids = rng.permutation(np.arange(1, paged.k.shape[1]))[:B*P]
tables = jnp.asarray(ids.reshape(B, P), jnp.int32)
pg = loop(lambda ck, cv, lens, li: paged_decode_attention(q, nk, nk, ck, cv,
            tables, lens, kvh=KVH, rep=H//KVH, d=Dp, true_d=D, layer=li),
          (paged.k, paged.v))
print(f"paged  S_pad={SPAD}: {marginal(pg)*1e3:.3f} ms/step", flush=True)
