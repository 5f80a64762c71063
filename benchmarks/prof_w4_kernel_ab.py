"""A/B the W4A16 kernel variants on the four 8B matmul shapes.

Times each (mode, tn) variant as a traced while_loop marginal over the full
32-layer chain of 8B shapes, against the pure-bf16 MXU reference (the
dense dot on pre-materialized weights = the floor the kernel chases).

Usage: python benchmarks/prof_w4_kernel_ab.py [batch]
"""
import functools
import sys
import time

sys.path.insert(0, '/root/repo')
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128

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
# 8B shapes: (n, k) for qkv / o / gate_up / down
SHAPES = [(6144, 4096), (4096, 4096), (28672, 4096), (4096, 14336)]

key = jax.random.PRNGKey(0)
_kc = [0]


def nk():
    _kc[0] += 1
    return jax.random.fold_in(key, _kc[0])


weights = []
for n, k in SHAPES:
    tk = choose_k_tile(k, G)
    k_pad = padded_k(k, G)
    wp = jax.random.randint(nk(), (k_pad // 8, n), -2**31, 2**31 - 1,
                            jnp.int32)
    sc = jax.random.uniform(nk(), (k_pad // G, n), jnp.float32, 1e-3, 3e-3)
    wd = jax.random.normal(nk(), (k, n), jnp.bfloat16) * 0.01
    weights.append((wp, sc, wd, n, k, k_pad, tk))
jax.block_until_ready(weights[-1][0])


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


def chain_loop(mode, tn):
    @jax.jit
    def loop(arrs, nsteps):
        x0 = jnp.ones((B, SHAPES[0][1]), dtype=jnp.bfloat16) * 0.01
        def body(carry):
            i, x = carry
            for _ in range(L):
                acc = None
                for (wp, sc), (_, _, wd, n, k, k_pad, tk) in zip(arrs,
                                                                 weights):
                    xi = (jnp.broadcast_to(x[:, :1], (B, k)) * 0.01 + 0.01
                          if k != x.shape[1] else x)
                    y = w4a16_matmul(
                        xi, wp, sc, None, n=n, k=k_pad, group_size=G,
                        tk=tk, tn=tn, out_dtype=jnp.bfloat16, mode=mode)
                    # every matmul feeds the carry (DCE-proof)
                    h = y[:, :SHAPES[0][1]]
                    acc = h if acc is None else acc + h
                x = jnp.clip(acc, -1, 1)
            return i + 1, x + x0
        _, x = jax.lax.while_loop(lambda c: c[0] < nsteps, body,
                                  (jnp.int32(0), x0))
        return jnp.sum(x).astype(jnp.float32)
    return loop


@jax.jit
def dense_loop(arrs_d, nsteps):
    x0 = jnp.ones((B, SHAPES[0][1]), dtype=jnp.bfloat16) * 0.01
    def body(carry):
        i, x = carry
        for _ in range(L):
            acc = None
            for wd, (_, _, _, n, k, k_pad, tk) in zip(arrs_d, weights):
                xi = (jnp.broadcast_to(x[:, :1], (B, k)) * 0.01 + 0.01
                      if k != x.shape[1] else x)
                y = jax.lax.dot_general(
                    xi, wd, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                h = y[:, :SHAPES[0][1]]
                acc = h if acc is None else acc + h
            x = jnp.clip(acc, -1, 1)
        return i + 1, x + x0
    _, x = jax.lax.while_loop(lambda c: c[0] < nsteps, body,
                              (jnp.int32(0), x0))
    return jnp.sum(x).astype(jnp.float32)


flops = 2 * B * sum(n * k for n, k in SHAPES) * L
arrs = [(wp, sc) for wp, sc, *_ in weights]
arrs_d = [wd for _, _, wd, *_ in weights]
ms = marginal(functools.partial(dense_loop, arrs_d)) * 1e3
print(f"B={B} dense bf16 reference: {ms:.3f} ms "
      f"({flops/ms*1e3/1e12:.0f} TFLOP/s)", flush=True)

for mode in ("int4", "mat"):
    for tn in (512, 1024):
        ms = marginal(functools.partial(chain_loop(mode, tn), arrs)) * 1e3
        print(f"B={B} mode={mode} tn={tn}: {ms:.3f} ms "
              f"({flops/ms*1e3/1e12:.0f} TFLOP/s)", flush=True)
