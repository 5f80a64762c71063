"""A/B: head-packed vs unpacked decode attention; lm_head W8A8 vs bf16."""
import sys
import time

sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from compressed_tensors_tpu.models.llama import init_kv_cache
from compressed_tensors_tpu.models.synthetic import (
    TINYLLAMA_1_1B,
    _synthetic_qt,
    make_synthetic_llama,  # noqa: F401
)
from compressed_tensors_tpu.ops.kernels.decode_attention import (
    decode_attention,
)
from compressed_tensors_tpu.ops.linear import quantized_matmul
from compressed_tensors_tpu.quantization import preset_name_to_scheme

config = TINYLLAMA_1_1B
B, L = 64, config.num_hidden_layers
H, KVH, D = 32, 4, 64
MAXLEN = 145  # bench shape -> s_pad 192


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


def attn_loop(head_pack):
    cache0 = init_kv_cache(config, B, MAXLEN, dtype=jnp.bfloat16,
                           head_pack=head_pack)
    kvh = cache0.k.shape[2]
    dp = cache0.k.shape[-1]
    rep = H // kvh

    @jax.jit
    def loop(ck, cv, nsteps):
        q = jnp.ones((B, H, dp), dtype=jnp.bfloat16) * 0.01
        nk = jnp.ones((B, kvh, dp), dtype=jnp.bfloat16) * 0.01

        def body(carry):
            i, ck, cv, acc = carry
            lens = jnp.full((B,), 16, dtype=jnp.int32) + i
            out = None
            for li in range(L):
                out, ck, cv = decode_attention(q, nk, nk, ck, cv, lens,
                                               kvh=kvh, rep=rep, d=dp,
                                               true_d=D, layer=li)
            return i + 1, ck, cv, acc + jnp.sum(out)

        _, ck, cv, acc = jax.lax.while_loop(
            lambda c: c[0] < nsteps, body,
            (jnp.int32(0), ck, cv, jnp.float32(0)))
        return acc

    import functools
    return marginal(functools.partial(loop, cache0.k, cache0.v))


print(f"attention packed:   {attn_loop(None)*1e3:.3f} ms/step", flush=True)
print(f"attention unpacked: {attn_loop(False)*1e3:.3f} ms/step", flush=True)

# lm_head alone
rng = np.random.default_rng(0)
scheme = preset_name_to_scheme("W8A8", ["Linear"])
lm_q = _synthetic_qt(rng, (config.vocab_size, config.hidden_size), scheme,
                     jnp.bfloat16, use_kernels=True)
lm_d = jnp.asarray(rng.standard_normal(
    (config.vocab_size, config.hidden_size)) * 0.02, jnp.bfloat16)


def head_loop(w, quant):
    @jax.jit
    def loop(w, nsteps):
        x = jnp.ones((B, config.hidden_size), dtype=jnp.bfloat16) * 0.01

        def body(carry):
            i, x = carry
            if quant:
                logits = quantized_matmul(x, w)
            else:
                logits = jax.lax.dot_general(
                    x, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            x = x + jnp.mean(logits, axis=-1, keepdims=True).astype(x.dtype)
            return i + 1, x

        _, x = jax.lax.while_loop(lambda c: c[0] < nsteps, body,
                                  (jnp.int32(0), x))
        return jnp.sum(x).astype(jnp.float32)

    import functools
    return marginal(functools.partial(loop, w))


print(f"lm_head W8A8: {head_loop(lm_q, True)*1e3:.3f} ms/step", flush=True)
print(f"lm_head bf16: {head_loop(lm_d, False)*1e3:.3f} ms/step", flush=True)
