"""tn sweep for the b8 kernel modes on selected 8B shapes.

Usage: python benchmarks/prof_w4_tn.py [batch] [mode]
"""
import functools
import sys
import time

sys.path.insert(0, '/root/repo')
B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MODE = sys.argv[2] if len(sys.argv) > 2 else "a8b"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from compressed_tensors_tpu.ops.kernels.w4a16_matmul import (
    choose_k_tile,
    padded_k,
    repack_w4_b8,
    retile_b8_scales,
    w4a16_matmul,
)

G = 128
L = 32
SHAPES = [(6144, 4096), (28672, 4096), (4096, 14336)]
TNS = {6144: [768, 1024, 1536, 3072, 6144],
       28672: [1024, 2048, 4096, 7168],
       4096: [1024, 2048, 4096]}

key = jax.random.PRNGKey(0)
_kc = [0]


def nk():
    _kc[0] += 1
    return jax.random.fold_in(key, _kc[0])


def marginal(fn, lo=8, hi=64):
    int(fn(jnp.int32(lo)))
    def t(n_):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            int(fn(jnp.int32(n_)))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(hi) - t(lo)) / (hi - lo)


for n, k in SHAPES:
    tk = choose_k_tile(k, G)
    k_pad = padded_k(k, G)
    u = jax.random.randint(nk(), (n, k_pad), 0, 16, jnp.int32)
    wp = repack_w4_b8(u, k_pad, tk)
    sc = jax.random.uniform(nk(), (k_pad // G, n), jnp.float32, 1e-3, 3e-3)
    sck, corr = retile_b8_scales(sc, None, k_pad, tk, G)
    jax.block_until_ready(wp)
    for tn in TNS[n]:
        @jax.jit
        def loop(wp, sc, corr, nsteps, n=n, k=k, k_pad=k_pad, tk=tk, tn=tn):
            x0 = jnp.ones((B, k), dtype=jnp.bfloat16) * 0.01
            def body(carry):
                i, x = carry
                for _ in range(L):
                    y = w4a16_matmul(x, wp, sc, corr, n=n, k=k_pad,
                                     group_size=G, tk=tk, tn=tn,
                                     out_dtype=jnp.bfloat16, mode=MODE)
                    x = jnp.broadcast_to(
                        jnp.clip(jnp.sum(y[:, :8], -1, keepdims=True)
                                 * 1e-6, -1, 1), (B, k)) + x0
                return i + 1, x
            _, x = jax.lax.while_loop(lambda c: c[0] < nsteps, body,
                                      (jnp.int32(0), x0))
            return jnp.sum(x).astype(jnp.float32)

        ms = marginal(functools.partial(loop, wp, sck, corr)) * 1e3 / L
        flops = 2 * B * n * k
        print(f"{MODE} n={n:6d} tn={tn:5d}: {ms*1e3:8.1f} us  "
              f"{flops/ms*1e3/1e12:6.1f} TF/s", flush=True)
