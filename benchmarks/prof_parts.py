"""Decompose marginal decode-step cost into matmul chain / attention /
lm_head components, each measured as an on-device loop with traced count."""
import os, sys, time
sys.path.insert(0, '/root/repo')
layout = sys.argv[1] if len(sys.argv) > 1 else "e8"
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from compressed_tensors_tpu.flags import set_flags
set_flags(w4_layout=layout)
if len(sys.argv) > 2:
    set_flags(w4_mode=sys.argv[2])
from compressed_tensors_tpu.models.synthetic import TINYLLAMA_1_1B, make_synthetic_llama
from compressed_tensors_tpu.models.llama import init_kv_cache
from compressed_tensors_tpu.ops.fuse import fuse_llama_layers
from compressed_tensors_tpu.ops.linear import quantized_matmul
from compressed_tensors_tpu.ops.kernels.decode_attention import decode_attention

config = TINYLLAMA_1_1B
B = 64
H, KVH, D = 32, 4, 64
rng = np.random.default_rng(0)
params = fuse_llama_layers(make_synthetic_llama(config, preset="W4A16", use_kernels=True))
layers = params["layers"]
print("meta:", layers[0]["qkv_proj"].kernel_meta, flush=True)

def marginal(fn, lo=8, hi=64):
    int(fn(jnp.int32(lo)))
    def t(n):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); int(fn(jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        return best
    tl, th = t(lo), t(hi)
    return (th - tl) / (hi - lo)

# ---- matmul chain only (22 layers x 4 fused matmuls)
@jax.jit
def mm_loop(layers, nsteps):
    x0 = jnp.ones((B, config.hidden_size), dtype=jnp.bfloat16) * 0.01
    def body(carry):
        i, x = carry
        for layer in layers:
            qkv = quantized_matmul(x, layer["qkv_proj"])
            x = quantized_matmul(qkv[:, :config.hidden_size], layer["o_proj"])
            gu = quantized_matmul(x, layer["gate_up_proj"])
            (split,) = layer["gate_up_split"].value
            x = quantized_matmul(jax.nn.silu(gu[:, :split]) * gu[:, split:],
                                 layer["down_proj"])
            x = jnp.clip(x, -1, 1)
        return i + 1, x + x0
    _, x = jax.lax.while_loop(lambda c: c[0] < nsteps, body, (jnp.int32(0), x0))
    return jnp.sum(x).astype(jnp.float32)

import functools
print(f"matmul chain: {marginal(functools.partial(mm_loop, layers))*1e3:.3f} ms/step", flush=True)

# ---- attention only (22 layers of decode_attention + rope-less fixed qkv)
MAXLEN = 88
cache0 = init_kv_cache(config, B, MAXLEN, dtype=jnp.bfloat16)
Dp = cache0.k.shape[-1]
KVHs = cache0.k.shape[2]  # head-packed layout: KVH/P rows per token

@jax.jit
def attn_loop(cache0, nsteps):
    q = jnp.ones((B, H, Dp), dtype=jnp.bfloat16) * 0.01
    nk = jnp.ones((B, KVHs, Dp), dtype=jnp.bfloat16) * 0.01
    ck, cv = cache0.k, cache0.v
    def body(carry):
        i, ck, cv, acc = carry
        lens = jnp.full((B,), 16, dtype=jnp.int32) + i
        out = None
        for li in range(config.num_hidden_layers):
            out, ck, cv = decode_attention(q, nk, nk, ck, cv, lens,
                                           kvh=KVHs, rep=H // KVHs, d=Dp,
                                           true_d=D, layer=li)
        return i + 1, ck, cv, acc + jnp.sum(out)
    _, ck, cv, acc = jax.lax.while_loop(lambda c: c[0] < nsteps, body,
                                        (jnp.int32(0), ck, cv, jnp.float32(0)))
    return acc

print(f"attention (22 layers): {marginal(functools.partial(attn_loop, cache0))*1e3:.3f} ms/step", flush=True)

# ---- embed + lm_head + argmax
emb = params["embed_tokens"]
@jax.jit
def head_loop(emb, nsteps):
    tok = jnp.zeros((B,), dtype=jnp.int32)
    def body(carry):
        i, tok = carry
        x = jnp.take(emb, tok, axis=0)
        logits = jax.lax.dot_general(x, emb, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        return i + 1, jnp.argmax(logits, axis=-1).astype(jnp.int32)
    _, tok = jax.lax.while_loop(lambda c: c[0] < nsteps, body, (jnp.int32(0), tok))
    return jnp.sum(tok)

print(f"embed+lm_head+argmax: {marginal(functools.partial(head_loop, emb))*1e3:.3f} ms/step", flush=True)
