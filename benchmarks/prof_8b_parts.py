"""Decompose the Llama-3-8B marginal decode-step cost into parts.

Same method as prof_parts.py (TinyLlama) but at the headline-BASELINE 8B
scale: on-device synthetic weights in kernel layout (host generation +
tunnel transfer would dominate), each part timed as a traced while_loop
marginal. Prints analytic floors next to each part so the gap is
attributable, not just measurable.

Usage: python benchmarks/prof_8b_parts.py [packed|e8] [batch]
"""
import functools
import sys
import time

sys.path.insert(0, '/root/repo')
layout = sys.argv[1] if len(sys.argv) > 1 else "packed"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from compressed_tensors_tpu.flags import set_flags

set_flags(w4_layout=layout)

from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.models.llama import init_kv_cache, llama_forward
from compressed_tensors_tpu.models.synthetic import LLAMA3_8B
from compressed_tensors_tpu.ops.fuse import Static
from compressed_tensors_tpu.ops.kernels.decode_attention import (
    decode_attention,
)
from compressed_tensors_tpu.ops.kernels.w4a16_matmul import (
    choose_k_tile,
    padded_k,
)
from compressed_tensors_tpu.ops.kernels.w8a8_matmul import prepare_w8_weight
from compressed_tensors_tpu.ops.linear import (
    QuantizedTensor,
    quantized_matmul,
)
from compressed_tensors_tpu.quantization import preset_name_to_scheme

config = LLAMA3_8B
H, I = config.hidden_size, config.intermediate_size
NH, KVH, D = (config.num_attention_heads, config.num_key_value_heads,
              config.head_dim)
V = config.vocab_size
L = config.num_hidden_layers
G = 128

scheme = preset_name_to_scheme(
    "FP8_DYNAMIC" if layout.startswith("fp8") else "W4A16", ["Linear"])
key = jax.random.PRNGKey(0)
_kc = [0]


def nk():
    _kc[0] += 1
    return jax.random.fold_in(key, _kc[0])


def qt_device(n, k):
    if layout.startswith("fp8"):
        # fp8 checkpoint weight -> prepare_for_kernels (int8 transcode +
        # tiled layout), checkpoint leaves dropped (HBM)
        import dataclasses

        from compressed_tensors_tpu.ops.linear import prepare_for_kernels

        w = jnp.clip(jax.random.normal(nk(), (n, k), jnp.float32) * 100,
                     -440, 440).astype(jnp.float8_e4m3fn)
        w_scale = jax.random.uniform(nk(), (n, 1), jnp.float32, 1e-4, 3e-4)
        qt = prepare_for_kernels(QuantizedTensor(
            weight=w, scale=w_scale, shape=(n, k), scheme=scheme,
            format=CompressionFormat.float_quantized.value))
        jax.block_until_ready(qt.kernel_packed)
        return dataclasses.replace(qt, weight=None, scale=None)
    tk = choose_k_tile(k, G)
    k_pad = padded_k(k, G)
    scales = jax.random.uniform(nk(), (k_pad // G, n), jnp.float32,
                                1e-3, 3e-3)
    if layout == "e8":
        w8 = jax.random.randint(nk(), (k_pad, n), -8, 8, jnp.int8)
        meta = ("w4e8", n, k, k_pad, G, tk)
    else:
        w8 = jax.random.randint(nk(), (k_pad // 8, n), -2**31, 2**31 - 1,
                                jnp.int32)
        meta = ("w4a16", n, k, k_pad, G, tk)
    return QuantizedTensor(kernel_packed=w8, kernel_scales=scales,
                           shape=(n, k), scheme=scheme,
                           format=CompressionFormat.pack_quantized.value,
                           kernel_meta=meta)


print(f"building 8B parts on device (layout={layout}, B={B})...",
      file=sys.stderr, flush=True)
t0 = time.time()
layer = {
    "qkv_proj": qt_device(NH * D + 2 * KVH * D, H),
    "qkv_splits": Static((NH * D, NH * D + KVH * D)),
    "o_proj": qt_device(H, NH * D),
    "gate_up_proj": qt_device(2 * I, H),
    "gate_up_split": Static((I,)),
    "down_proj": qt_device(H, I),
}
_lm_scheme = preset_name_to_scheme("W8A8", ["Linear"])
# pre-tiled (N/tn, K, tn) lm_head layout: contiguous weight-tile DMAs
_nt = -(-V // 512)
lm_head = QuantizedTensor(
    kernel_packed=jax.random.randint(nk(), (_nt, H, 512), -127, 128,
                                     jnp.int8),
    kernel_scales=jax.random.uniform(nk(), (1, V), jnp.float32, 1e-4, 3e-4),
    shape=(V, H), scheme=_lm_scheme,
    format=CompressionFormat.int_quantized.value,
    kernel_meta=("w8a8", V, H),
)
emb = jax.random.normal(nk(), (V, H), jnp.bfloat16) * 0.02
jax.block_until_ready(layer["down_proj"].kernel_packed)
print(f"built in {time.time()-t0:.0f}s", file=sys.stderr, flush=True)


def marginal(fn, lo=8, hi=64):
    int(fn(jnp.int32(lo)))
    def t(n):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            int(fn(jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(hi) - t(lo)) / (hi - lo)


# analytic floors (v5e: 197 TFLOP/s bf16, 394 int8, ~819 GB/s HBM)
MXU_BF16 = 197e12 * (min(B, 128) / 128)   # row-utilization-limited
MXU_INT8 = 394e12 * (min(B, 128) / 128)
HBM = 819e9
body_params = L * (H * (NH * D + 2 * KVH * D) + NH * D * H
                   + H * 2 * I + I * H)
body_flops = 2 * B * body_params
body_bytes = body_params * 0.5 + L * (
    (H + NH * D + 2 * I + I) * 4 * (H // G) / 8)  # int4 + f32 scales approx
head_flops = 2 * B * V * H
head_bytes = V * H * 1  # int8
print(f"floors: body MXU {body_flops/MXU_BF16*1e3:.2f} ms, "
      f"body HBM {body_bytes/HBM*1e3:.2f} ms, "
      f"lm_head int8 MXU {head_flops/MXU_INT8*1e3:.2f} ms, "
      f"lm_head HBM {head_bytes/HBM*1e3:.2f} ms", flush=True)


# ---- matmul chain only (32 layers x 4 fused matmuls)
@jax.jit
def mm_loop(layer, nsteps):
    x0 = jnp.ones((B, H), dtype=jnp.bfloat16) * 0.01
    def body(carry):
        i, x = carry
        for _ in range(L):
            qkv = quantized_matmul(x, layer["qkv_proj"])
            x = quantized_matmul(qkv[:, :H], layer["o_proj"])
            gu = quantized_matmul(x, layer["gate_up_proj"])
            (split,) = layer["gate_up_split"].value
            x = quantized_matmul(jax.nn.silu(gu[:, :split]) * gu[:, split:],
                                 layer["down_proj"])
            x = jnp.clip(x, -1, 1)
        return i + 1, x + x0
    _, x = jax.lax.while_loop(lambda c: c[0] < nsteps, body,
                              (jnp.int32(0), x0))
    return jnp.sum(x).astype(jnp.float32)


mm_ms = marginal(functools.partial(mm_loop, layer)) * 1e3
print(f"matmul chain ({L} layers): {mm_ms:.3f} ms/step "
      f"({body_flops/MXU_BF16*1e3/mm_ms*100:.0f}% of MXU floor)", flush=True)

# ---- attention only (32 layers of decode_attention, GQA 8 x 128)
prompt_len = 16
MAXLEN = prompt_len + 64 + 1
cache0 = init_kv_cache(config, B, MAXLEN, dtype=jnp.bfloat16)
Dp = cache0.k.shape[-1]
KVHs = cache0.k.shape[2]
S_pad = cache0.k.shape[3]
attn_bytes = L * B * KVHs * S_pad * Dp * 2 * 2  # k+v read
print(f"cache layout: KVH'={KVHs} S_pad={S_pad} Dp={Dp}; "
      f"stream floor {attn_bytes/HBM*1e3:.2f} ms", flush=True)


@jax.jit
def attn_loop(cache0, nsteps):
    q = jnp.ones((B, NH, Dp), dtype=jnp.bfloat16) * 0.01
    nkv = jnp.ones((B, KVHs, Dp), dtype=jnp.bfloat16) * 0.01
    def body(carry):
        i, ck, cv, acc = carry
        lens = jnp.full((B,), prompt_len, dtype=jnp.int32) + i
        out = None
        for li in range(L):
            out, ck, cv = decode_attention(q, nkv, nkv, ck, cv, lens,
                                           kvh=KVHs, rep=NH // KVHs, d=Dp,
                                           true_d=D, layer=li)
        return i + 1, ck, cv, acc + jnp.sum(out)
    _, ck, cv, acc = jax.lax.while_loop(
        lambda c: c[0] < nsteps, body,
        (jnp.int32(0), cache0.k, cache0.v, jnp.float32(0)))
    return acc


at_ms = marginal(functools.partial(attn_loop, cache0)) * 1e3
print(f"attention ({L} layers): {at_ms:.3f} ms/step", flush=True)

# ---- embed + int8 lm_head + argmax
@jax.jit
def head_loop(emb, lm_head, nsteps):
    tok = jnp.zeros((B,), dtype=jnp.int32)
    def body(carry):
        i, tok = carry
        x = jnp.take(emb, tok, axis=0)
        logits = quantized_matmul(x, lm_head)
        return i + 1, jnp.argmax(logits, axis=-1).astype(jnp.int32)
    _, tok = jax.lax.while_loop(lambda c: c[0] < nsteps, body,
                                (jnp.int32(0), tok))
    return jnp.sum(tok)


hd_ms = marginal(functools.partial(head_loop, emb, lm_head)) * 1e3
print(f"embed+int8 lm_head+argmax: {hd_ms:.3f} ms/step", flush=True)

# ---- full step for the residue
params = {"embed_tokens": emb, "norm": jnp.ones((H,), jnp.bfloat16),
          "lm_head": lm_head, "layers": []}
for i in range(L):
    params["layers"].append({
        **layer,
        "input_layernorm": jnp.ones((H,), jnp.bfloat16),
        "post_attention_layernorm": jnp.ones((H,), jnp.bfloat16),
    })

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, V, size=(B, prompt_len)), jnp.int32)


@jax.jit
def full_loop(params, input_ids, nsteps):
    cache = init_kv_cache(config, B, MAXLEN, dtype=jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(input_ids.shape[1]),
                                 input_ids.shape)
    logits, cache = llama_forward(params, config, input_ids, positions,
                                  cache, fresh_prefill=True)
    token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    def body(carry):
        i, token, cache, acc = carry
        logits, cache = llama_forward(params, config, token[:, None],
                                      cache.lengths[:, None], cache)
        token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        return i + 1, token, cache, acc + jnp.sum(token)
    _, token, cache, acc = jax.lax.while_loop(
        lambda c: c[0] < nsteps, body, (jnp.int32(0), token, cache,
                                        jnp.int32(0)))
    return acc


fl_ms = marginal(functools.partial(full_loop, params, ids)) * 1e3
residue = fl_ms - mm_ms - at_ms - hd_ms
print(f"full step: {fl_ms:.3f} ms/step -> {B/fl_ms*1e3:.0f} tok/s", flush=True)
print(f"residue (norms/rope/glue/dispatch): {residue:.3f} ms/step", flush=True)
