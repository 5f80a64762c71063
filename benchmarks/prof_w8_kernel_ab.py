"""A/B the W8A8 kernel layouts/tilings on the 8B matmul shapes.

Compares the fused dynamic-quant kernel (flat vs pre-tiled weight layouts,
tn sweep) against an XLA int8 dot on pre-quantized activations (the pure
HBM/MXU reference — no act-quant work).

Usage: python benchmarks/prof_w8_kernel_ab.py [batch]
"""
import functools
import sys
import time

sys.path.insert(0, '/root/repo')
B = int(sys.argv[1]) if len(sys.argv) > 1 else 64

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from compressed_tensors_tpu.ops.kernels.w8a8_matmul import (
    default_w8_tn,
    prepare_w8_weight_tiled,
    w8a8_matmul,
)

L = 32
SHAPES = [(6144, 4096), (4096, 4096), (28672, 4096), (4096, 14336)]
HBM = 819e9
total_bytes = L * sum(n * k for n, k in SHAPES)

key = jax.random.PRNGKey(0)
_kc = [0]


def nk():
    _kc[0] += 1
    return jax.random.fold_in(key, _kc[0])


def marginal(fn, lo=8, hi=64):
    float(fn(jnp.int32(lo)))
    def t(n_):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            float(fn(jnp.int32(n_)))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(hi) - t(lo)) / (hi - lo)


def build(tiled, tn=None):
    ws = []
    for n, k in SHAPES:
        w = jax.random.randint(nk(), (n, k), -127, 128, jnp.int8)
        sc = jax.random.uniform(nk(), (1, n), jnp.float32, 1e-4, 3e-4)
        if tiled:
            wt = prepare_w8_weight_tiled(w, tn=tn or default_w8_tn(n, k))
        else:
            wt = w.T
        ws.append((wt, sc))
    jax.block_until_ready(ws[-1][0])
    return ws


def chain(ws):
    @jax.jit
    def loop(arrs, nsteps):
        x0 = jnp.ones((B, SHAPES[0][1]), dtype=jnp.bfloat16) * 0.01
        def body(carry):
            i, x = carry
            for _ in range(L):
                acc = None
                for (wt, sc), (n, k) in zip(arrs, SHAPES):
                    xi = (jnp.broadcast_to(x[:, :1], (B, k)) * 0.01 + 0.01
                          if k != x.shape[1] else x)
                    y = w8a8_matmul(xi, wt, sc, n=n, k=k,
                                    out_dtype=jnp.bfloat16)
                    h = y[:, :SHAPES[0][1]]
                    acc = h if acc is None else acc + h
                x = jnp.clip(acc, -1, 1)
            return i + 1, x + x0
        _, x = jax.lax.while_loop(lambda c: c[0] < nsteps, body,
                                  (jnp.int32(0), x0))
        return jnp.sum(x).astype(jnp.float32)
    return loop


# XLA int8 reference: pre-quantized activations, plain dots
def xla_chain(ws8):
    @jax.jit
    def loop(arrs, nsteps):
        x0 = jnp.ones((B, SHAPES[0][1]), dtype=jnp.int8)
        def body(carry):
            i, x = carry
            for _ in range(L):
                acc = None
                for w, (n, k) in zip(arrs, SHAPES):
                    xi = (jnp.broadcast_to(x[:, :1], (B, k))
                          if k != x.shape[1] else x)
                    y = jax.lax.dot_general(
                        xi, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    h = (y[:, :SHAPES[0][1]] >> 8).astype(jnp.int8)
                    acc = h if acc is None else acc + h
                x = acc
            return i + 1, x + x0
        _, x = jax.lax.while_loop(lambda c: c[0] < nsteps, body,
                                  (jnp.int32(0), x0))
        return jnp.sum(x).astype(jnp.float32)
    return loop


print(f"HBM floor: {total_bytes/HBM*1e3:.2f} ms", flush=True)
ws_flat = build(False)
arrs8 = [w for w, _ in ws_flat]
ms = marginal(functools.partial(xla_chain(arrs8), arrs8)) * 1e3
print(f"B={B} XLA int8 dots (pre-quant acts): {ms:.3f} ms "
      f"({100*total_bytes/HBM*1e3/ms:.0f}% of HBM floor)", flush=True)

ms = marginal(functools.partial(chain(ws_flat), ws_flat)) * 1e3
print(f"B={B} kernel flat: {ms:.3f} ms "
      f"({100*total_bytes/HBM*1e3/ms:.0f}% of HBM floor)", flush=True)

for tn in (None, 512, 1024, 2048):
    ws_t = build(True, tn)
    ms = marginal(functools.partial(chain(ws_t), ws_t)) * 1e3
    shapes = [w.shape[2] for w, _ in ws_t]
    print(f"B={B} kernel tiled tn={tn or 'auto'} {shapes}: {ms:.3f} ms "
          f"({100*total_bytes/HBM*1e3/ms:.0f}% of HBM floor)", flush=True)
