"""Per-shape W4A16 kernel profile on the 8B decode shapes.

For each (n, k) matmul shape, times the kernel alone (x32 layers worth of
that shape inside one traced loop) and reports ms, effective TFLOP/s, and
% of its own strict HBM/MXU floors — so the chain gap attributes to a
specific shape instead of the whole chain.

Usage: python benchmarks/prof_w4_shapes.py [batch] [tn|0=adaptive]
"""
import functools
import sys
import time

sys.path.insert(0, '/root/repo')
B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
TN = int(sys.argv[2]) if len(sys.argv) > 2 else 0

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from compressed_tensors_tpu.ops.kernels.w4a16_matmul import (
    choose_k_tile,
    padded_k,
    w4a16_matmul,
)

G = 128
L = 32
SHAPES = [(6144, 4096), (4096, 4096), (28672, 4096), (4096, 14336)]
PEAK_BF16 = 197e12
HBM_BPS = 819e9

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
    wp = jax.random.randint(nk(), (k_pad // 8, n), -2**31, 2**31 - 1,
                            jnp.int32)
    sc = jax.random.uniform(nk(), (k_pad // G, n), jnp.float32, 1e-3, 3e-3)
    jax.block_until_ready(wp)

    tn = None if TN == 0 else TN

    @jax.jit
    def loop(wp, sc, nsteps, n=n, k=k, k_pad=k_pad, tk=tk, tn=tn):
        x0 = jnp.ones((B, k), dtype=jnp.bfloat16) * 0.01
        def body(carry):
            i, x = carry
            for _ in range(L):
                y = w4a16_matmul(x, wp, sc, None, n=n, k=k_pad,
                                 group_size=G, tk=tk, tn=tn,
                                 out_dtype=jnp.bfloat16)
                x = jnp.broadcast_to(
                    jnp.clip(jnp.sum(y[:, :8], -1, keepdims=True)
                             * 1e-6, -1, 1), (B, k)) + x0
            return i + 1, x
        _, x = jax.lax.while_loop(lambda c: c[0] < nsteps, body,
                                  (jnp.int32(0), x0))
        return jnp.sum(x).astype(jnp.float32)

    ms = marginal(functools.partial(loop, wp, sc)) * 1e3 / L
    flops = 2 * B * n * k
    wbytes = n * k_pad / 2 + k_pad / G * n * 4
    iobytes = wbytes + B * k * 2 + B * n * 2
    t_mxu = flops / PEAK_BF16 * 1e3
    t_hbm = iobytes / HBM_BPS * 1e3
    sol = max(t_mxu, t_hbm)
    print(f"n={n:6d} k={k:6d}: {ms*1e3:8.1f} us  "
          f"{flops/ms*1e3/1e12:6.1f} TF/s  "
          f"mxu {t_mxu*1e3:6.1f} hbm {t_hbm*1e3:6.1f} us  "
          f"{sol/ms*100:5.1f}% of sol", flush=True)
