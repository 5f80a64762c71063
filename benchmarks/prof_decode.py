"""Decompose decode-step time: per-matmul microbench at TinyLlama decode
shapes, attention kernel, and whole-step, on the real chip."""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from compressed_tensors_tpu.models.synthetic import TINYLLAMA_1_1B, make_synthetic_llama, _synthetic_qt
from compressed_tensors_tpu.ops.fuse import fuse_llama_layers
from compressed_tensors_tpu.ops.linear import quantized_matmul
from compressed_tensors_tpu.quantization import preset_name_to_scheme

config = TINYLLAMA_1_1B
B = 64
rng = np.random.default_rng(0)

def timeit(f, *args, iters=50, tag=""):
    f(*args)  # compile
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1e6:.0f} us", flush=True)
    return dt

scheme = preset_name_to_scheme("W4A16", ["Linear"])
shapes = {
    "qkv  (2560,2048)": (2560, 2048),
    "o    (2048,2048)": (2048, 2048),
    "gate_up(11264,2048)": (11264, 2048),
    "down (2048,5632)": (2048, 5632),
}

total = 0.0
for tag, (n, k) in shapes.items():
    qt = _synthetic_qt(rng, (n, k), scheme, jnp.bfloat16, use_kernels=True)
    x = jnp.asarray(rng.standard_normal((B, k)), dtype=jnp.bfloat16)
    mm = jax.jit(lambda x, qt: quantized_matmul(x, qt))
    dt = timeit(mm, x, qt, tag=f"{tag} kernel={qt.kernel_meta}")
    bytes_w = qt.kernel_packed.size * qt.kernel_packed.dtype.itemsize
    print(f"   weight bytes {bytes_w/1e6:.1f}MB -> {bytes_w/dt/1e9:.0f} GB/s eff", flush=True)
    total += dt

print(f"sum of 4 matmuls x22 layers: {total*22*1e3:.2f} ms", flush=True)

# lm_head dense
w = jnp.asarray(rng.standard_normal((32000, 2048)) * 0.02, dtype=jnp.bfloat16)
x = jnp.asarray(rng.standard_normal((B, 2048)), dtype=jnp.bfloat16)
lm = jax.jit(lambda x, w: (x @ w.T).astype(jnp.bfloat16))
dt = timeit(lm, x, w, tag="lm_head dense bf16")
print(f"   {w.size*2/1e6:.0f}MB -> {w.size*2/dt/1e9:.0f} GB/s", flush=True)

# decode attention at bench shapes
from compressed_tensors_tpu.models.llama import init_kv_cache, llama_forward
params = fuse_llama_layers(make_synthetic_llama(config, preset="W4A16", use_kernels=True))
max_len = 49
cache = init_kv_cache(config, B, max_len, dtype=jnp.bfloat16)

tok = jnp.zeros((B, 1), dtype=jnp.int32)
pos = jnp.full((B, 1), 20, dtype=jnp.int32)

@jax.jit
def step(params, tok, pos, cache):
    logits, cache = llama_forward(params, config, tok, pos, cache)
    return jnp.argmax(logits[:, -1, :], axis=-1), cache

out = step(params, tok, pos, cache)
jax.block_until_ready(out)
t0 = time.perf_counter()
iters = 50
for _ in range(iters):
    t, cache = step(params, tok, pos, cache)
jax.block_until_ready(cache.k)
dt = (time.perf_counter() - t0) / iters
print(f"full decode step: {dt*1e3:.3f} ms -> {B/dt:.0f} tok/s", flush=True)
