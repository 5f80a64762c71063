"""Long-prompt prefill throughput + TTFT (TinyLlama W4A16).

All parts are measured MARGINALLY (the prefill repeated a traced number of
times inside one dispatch; cost = (T(hi) - T(lo)) / (hi - lo)) so the
~70-100 ms fixed per-dispatch overhead of the remote-TPU tunnel never
pollutes attribution. TTFT is additionally reported as the raw single
dispatch (what a user actually waits for, overhead included).

Usage: python benchmarks/prof_prefill.py [batch]
"""
import functools
import sys
import time

sys.path.insert(0, '/root/repo')
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from compressed_tensors_tpu.models.llama import init_kv_cache, llama_forward
from compressed_tensors_tpu.models.synthetic import (
    TINYLLAMA_1_1B,
    make_synthetic_llama,
)
from compressed_tensors_tpu.ops.fuse import fuse_llama_layers
from compressed_tensors_tpu.ops.kernels.prefill_attention import (
    prefill_attention,
)
from compressed_tensors_tpu.ops.linear import quantized_matmul

PEAK_BF16 = 197e12
config = TINYLLAMA_1_1B
H, I, L = (config.hidden_size, config.intermediate_size,
           config.num_hidden_layers)
KVH, NH, D = (config.num_key_value_heads, config.num_attention_heads,
              config.head_dim)
body_params = L * (2 * H * H + 2 * KVH * D * H + 3 * I * H)

params = fuse_llama_layers(
    make_synthetic_llama(config, preset="W4A16", use_kernels=True))
rng = np.random.default_rng(0)


def marginal(fn, lo=1, hi=4):
    float(fn(jnp.int32(lo)))
    def t(n):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            float(fn(jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(hi) - t(lo)) / (hi - lo)


for S in (512, 1024, 2048):
    ids = jnp.asarray(rng.integers(0, config.vocab_size, (B, S)), jnp.int32)

    # ---- full prefill, marginal -------------------------------------- #
    @jax.jit
    def prefill_loop(params, ids, n, S=S):
        def body(carry):
            i, acc = carry
            cache = init_kv_cache(config, B, S + 64, dtype=jnp.bfloat16)
            positions = jnp.broadcast_to(jnp.arange(S), (B, S))
            rot = jnp.where(i % 2 == 0, ids,
                            (ids + 1) % config.vocab_size)
            logits, cache = llama_forward(params, config, rot, positions,
                                          cache, fresh_prefill=True,
                                          last_logit_only=True)
            tok = jnp.argmax(logits[:, -1, :], axis=-1)
            return i + 1, acc + jnp.sum(tok)
        _, acc = jax.lax.while_loop(lambda c: c[0] < n, body,
                                    (jnp.int32(0), jnp.int32(0)))
        return acc

    fn = functools.partial(prefill_loop, params, ids)
    dt = marginal(fn)
    # raw single dispatch = user-visible TTFT
    t0 = time.perf_counter()
    float(fn(jnp.int32(1)))
    ttft = time.perf_counter() - t0

    gemm_floor = 2 * B * S * body_params / PEAK_BF16
    # score + pv dots, causal, whole L-layer chain (was per-layer — the
    # printed "% of score floor" under-read by a factor of L)
    attn_flops = B * NH * S * S * D * 2 * 2 * 0.5 * L
    attn_floor = attn_flops / PEAK_BF16
    floor = gemm_floor + attn_floor
    print(f"S={S:5d} B={B}: prefill {dt*1e3:7.2f} ms marginal "
          f"(TTFT {ttft*1e3:6.1f} ms raw), {B*S/dt/1e3:7.1f}k tok/s, "
          f"floor {floor*1e3:6.2f} ms -> {100*floor/dt:5.1f}%", flush=True)

    # ---- GEMM chain only at prefill row count ------------------------ #
    @jax.jit
    def chain_loop(params, n, S=S):
        x0 = jnp.ones((B * S, H), dtype=jnp.bfloat16) * 0.01
        def body(carry):
            i, x = carry
            for layer in params["layers"]:
                qkv = quantized_matmul(x, layer["qkv_proj"])
                x = quantized_matmul(qkv[:, :H], layer["o_proj"])
                gu = quantized_matmul(x, layer["gate_up_proj"])
                (split,) = layer["gate_up_split"].value
                x = quantized_matmul(
                    jax.nn.silu(gu[:, :split]) * gu[:, split:],
                    layer["down_proj"])
                x = jnp.clip(x, -1, 1)
            return i + 1, x + x0
        _, x = jax.lax.while_loop(lambda c: c[0] < n, body,
                                  (jnp.int32(0), x0))
        return jnp.sum(x).astype(jnp.float32)

    dt_g = marginal(functools.partial(chain_loop, params))
    print(f"        GEMM chain: {dt_g*1e3:7.2f} ms "
          f"({100*gemm_floor/dt_g:5.1f}% of MXU floor)", flush=True)

    # ---- flash-prefill attention only -------------------------------- #
    q = jnp.asarray(rng.normal(size=(B, S, NH, D)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, KVH, D)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, KVH, D)) * 0.1, jnp.bfloat16)

    @jax.jit
    def attn_loop(q, k, v, n):
        def body(carry):
            i, x = carry
            o = x
            for _ in range(L):
                o = prefill_attention(o, k, v)
            return i + 1, (o * 0.999).astype(x.dtype)
        _, x = jax.lax.while_loop(lambda c: c[0] < n, body, (jnp.int32(0), q))
        return jnp.sum(x).astype(jnp.float32)

    dt_a = marginal(functools.partial(attn_loop, q, k, v))
    print(f"        flash-prefill x{L}: {dt_a*1e3:7.2f} ms "
          f"({100*attn_floor/dt_a:5.1f}% of score floor); "
          f"residue {max(dt - dt_g - dt_a, 0)*1e3:.2f} ms", flush=True)
