import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
from compressed_tensors_tpu.models.synthetic import TINYLLAMA_1_1B, make_synthetic_llama
from compressed_tensors_tpu.models import llama
from compressed_tensors_tpu.models.llama import init_kv_cache, llama_forward
from compressed_tensors_tpu.ops.linear import quantized_matmul

config = TINYLLAMA_1_1B
batch, prompt_len, steps = 64, 16, 32
max_len = prompt_len + steps + 1
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, config.vocab_size, size=(batch, prompt_len)), dtype=jnp.int32)

def bench(tag):
    @jax.jit
    def run(params, input_ids):
        B = input_ids.shape[0]
        cache = init_kv_cache(config, B, max_len, dtype=jnp.bfloat16)
        positions = jnp.broadcast_to(jnp.arange(input_ids.shape[1]), input_ids.shape)
        logits, cache = llama_forward(params, config, input_ids, positions, cache)
        token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        def body(i, carry):
            token, cache, acc = carry
            logits, cache = llama_forward(params, config, token[:, None], cache.lengths[:, None], cache)
            token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return token, cache, acc + jnp.sum(token)
        token, cache, acc = jax.lax.fori_loop(0, steps, body, (token, cache, jnp.int32(0)))
        return acc
    params = make_synthetic_llama(config, preset="W4A16", use_kernels=True)
    int(run(params, ids))
    times = []
    for _ in range(3):
        t0 = time.perf_counter(); int(run(params, ids)); times.append(time.perf_counter()-t0)
    print(f"{tag}: {batch*steps/min(times):.0f} tok/s ({min(times)/steps*1e3:.2f} ms/step)", flush=True)

bench("full")

# ablate attention (identity attention output)
orig_attention = llama._attention
def no_attention(layer, x, cos, sin, kv_k, kv_v, cache_lens, config, positions):
    B, S, _ = x.shape
    out = quantized_matmul(x, layer["o_proj"]) * 0 + x
    return out, kv_k, kv_v
llama._attention = no_attention
bench("no-attention")
llama._attention = orig_attention

# ablate mlp
orig_mlp = llama._mlp
llama._mlp = lambda layer, x: x
bench("no-mlp")
llama._mlp = orig_mlp

# ablate lm_head (logits = narrow slice)
