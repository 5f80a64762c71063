"""Benchmark: batched decode throughput, TinyLlama-1.1B W4A16 run-compressed
(BASELINE config 1), on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/s/chip", "vs_baseline": R}

vs_baseline compares against the reference-equivalent execution mode:
the same model decompressed to dense bf16 (the reference library's default
load path decompresses before inference; run-compressed is delegated to
vLLM). R > 1 means running compressed beats running dense.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(preset, use_kernels, dense=False):
    from compressed_tensors_tpu.models.synthetic import (
        TINYLLAMA_1_1B,
        make_synthetic_llama,
    )

    from compressed_tensors_tpu.ops.fuse import fuse_llama_layers

    config = TINYLLAMA_1_1B
    if dense:
        params = make_synthetic_llama(config, preset="UNQUANTIZED",
                                      use_kernels=False)
    else:
        params = make_synthetic_llama(config, preset=preset,
                                      use_kernels=use_kernels)
    params = fuse_llama_layers(params)
    return params, config


def bench_decode(params, config, batch=64, prompt_len=16, steps=32):
    from compressed_tensors_tpu.models.llama import init_kv_cache, llama_forward

    max_len = prompt_len + steps + 1

    @jax.jit
    def prefill_and_decode(params, input_ids):
        B = input_ids.shape[0]
        cache = init_kv_cache(config, B, max_len, dtype=jnp.bfloat16)
        positions = jnp.broadcast_to(
            jnp.arange(input_ids.shape[1]), input_ids.shape
        )
        logits, cache = llama_forward(params, config, input_ids, positions,
                                      cache, fresh_prefill=True)
        token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)

        def body(i, carry):
            token, cache, acc = carry
            positions = cache.lengths[:, None]
            logits, cache = llama_forward(params, config, token[:, None],
                                          positions, cache)
            token = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            return token, cache, acc + jnp.sum(token)

        token, cache, acc = jax.lax.fori_loop(
            0, steps, body, (token, cache, jnp.int32(0))
        )
        return acc

    rng = np.random.default_rng(0)
    input_ids = jnp.asarray(
        rng.integers(0, config.vocab_size, size=(batch, prompt_len)),
        dtype=jnp.int32,
    )

    # warmup (compile)
    int(prefill_and_decode(params, input_ids))
    t0 = time.perf_counter()
    int(prefill_and_decode(params, input_ids))
    dt = time.perf_counter() - t0
    tokens = batch * steps
    return tokens / dt, dt


def main():
    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    # steps amortizes the fixed per-dispatch host overhead (~tens of ms
    # through the remote-TPU tunnel) that is not part of steady-state
    # decode; both the compressed and the dense-baseline run pay it
    # identically either way.
    batch, steps = 64, 128

    params, config = build("W4A16", use_kernels=(backend == "tpu"))
    tps, dt = bench_decode(params, config, batch=batch, steps=steps)
    log(f"W4A16 run-compressed: {tps:.1f} tok/s ({dt:.2f}s for "
        f"{batch}x{steps} tokens)")
    del params

    params_d, _ = build("W4A16", use_kernels=False, dense=True)
    tps_dense, dt_d = bench_decode(params_d, config, batch=batch, steps=steps)
    log(f"dense bf16 (reference-equivalent decompressed): "
        f"{tps_dense:.1f} tok/s ({dt_d:.2f}s)")

    print(json.dumps({
        "metric": "decode_throughput_tinyllama_1.1b_w4a16_bs64",
        "value": round(tps, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tps / tps_dense, 3),
    }))


if __name__ == "__main__":
    main()
