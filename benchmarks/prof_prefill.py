"""Long-prompt prefill throughput + TTFT (TinyLlama W4A16).

Measures full-forward prefill at S in {512, 1024, 2048} against the
analytic MXU floor (prefill is GEMM-dominated: 2*B*S*params FLOPs at full
MXU rate once B*S >= 128 rows), and the attention-only cost of the flash
prefill kernel vs its score-FLOPs floor.

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


def timed(fn, *args):
    # force a value fetch (block_until_ready alone does not round-trip the
    # remote-TPU tunnel)
    float(jnp.sum(fn(*args)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


for S in (512, 1024, 2048):
    ids = jnp.asarray(rng.integers(0, config.vocab_size, (B, S)), jnp.int32)

    @functools.partial(jax.jit, static_argnames=())
    def prefill(params, ids, S=S):
        cache = init_kv_cache(config, B, S + 64, dtype=jnp.bfloat16)
        positions = jnp.broadcast_to(jnp.arange(S), (B, S))
        logits, cache = llama_forward(params, config, ids, positions, cache,
                                      fresh_prefill=True,
                                      last_logit_only=True)
        return jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.float32)

    dt = timed(prefill, params, ids)
    gemm_floor = 2 * B * S * body_params / PEAK_BF16
    attn_flops = B * NH * S * S * D * 2  # scores + pv
    attn_floor = attn_flops / PEAK_BF16
    tps = B * S / dt
    print(f"S={S:5d} B={B}: prefill {dt*1e3:7.2f} ms (TTFT), "
          f"{tps/1e3:7.1f}k tok/s, GEMM floor {gemm_floor*1e3:6.2f} ms, "
          f"attn floor {attn_floor*1e3:5.2f} ms, "
          f"{100*(gemm_floor+attn_floor)/dt:5.1f}% of floor", flush=True)

    # attention-only: the flash prefill kernel in isolation
    q = jnp.asarray(rng.normal(size=(B, S, NH, D)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, KVH, D)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, KVH, D)) * 0.1, jnp.bfloat16)

    @jax.jit
    def attn_only(q, k, v):
        out = q
        for _ in range(L):
            out = prefill_attention(out, k, v)
        return out

    dt_a = timed(attn_only, q, k, v)
    print(f"        flash-prefill x{L}: {dt_a*1e3:7.2f} ms "
          f"({100*L*attn_floor/dt_a:5.1f}% of score floor)", flush=True)
