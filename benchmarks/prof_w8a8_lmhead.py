"""Chase the W8A8 kernel slowdown at lm_head-sized N."""
import functools
import sys
import time

sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")

from compressed_tensors_tpu.ops.kernels.w8a8_matmul import w8a8_matmul

B, K = 64, 2048
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, K)) * 0.1, jnp.bfloat16)


def marginal(fn, lo=8, hi=64):
    float(fn(jnp.int32(lo)))
    def t(n):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            float(fn(jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(hi) - t(lo)) / (hi - lo)


for n, tn in [(5632, 512), (32000, 512), (32000, 256), (32000, 1024),
              (32000, 2048)]:
    w = jnp.asarray(rng.integers(-127, 127, size=(K, n)), jnp.int8)
    ws = jnp.asarray(rng.uniform(1e-4, 2e-4, size=(1, n)), jnp.float32)

    @functools.partial(jax.jit, static_argnames=())
    def loop(w, ws, nsteps, n=n, tn=tn):
        def body(carry):
            i, xx = carry
            y = w8a8_matmul(xx, w, ws, n=n, k=K, tn=tn,
                            out_dtype=jnp.bfloat16)
            xx = xx + jnp.mean(y, axis=-1, keepdims=True)
            return i + 1, xx

        _, xx = jax.lax.while_loop(lambda c: c[0] < nsteps, body,
                                   (jnp.int32(0), x))
        return jnp.sum(xx).astype(jnp.float32)

    ms = marginal(functools.partial(loop, w, ws)) * 1e3
    print(f"n={n:6d} tn={tn:5d}: {ms:.3f} ms/step", flush=True)

# dense bf16 comparison at n=32000
wd = jnp.asarray(rng.standard_normal((32000, K)) * 0.02, jnp.bfloat16)


@jax.jit
def dense_loop(w, nsteps):
    def body(carry):
        i, xx = carry
        y = jax.lax.dot_general(xx, w, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        xx = xx + jnp.mean(y, axis=-1, keepdims=True).astype(xx.dtype)
        return i + 1, xx

    _, xx = jax.lax.while_loop(lambda c: c[0] < nsteps, body,
                               (jnp.int32(0), x))
    return jnp.sum(xx).astype(jnp.float32)


print(f"dense bf16 n=32000: {marginal(functools.partial(dense_loop, wd))*1e3:.3f} ms/step")
