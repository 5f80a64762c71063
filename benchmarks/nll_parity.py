"""NLL parity measurement: run-compressed execution vs reference-equivalent
decompressed execution (BASELINE accuracy metric, target delta <= 0.05).

The reference library's default load path decompresses W4A16 checkpoints to
dense bf16 and runs plain matmuls (ref model_compressor.py:246-260); vLLM
runs them compressed. Our engine runs compressed by default. This harness
measures, over a fixed synthetic corpus on one model instance:

  mean next-token NLL under
    dense   — dequantized bf16 weights, dense MXU dots (reference mode)
    int4b   — fused b8 kernel, bf16 activations (our default)
    a8b     — fused b8 kernel, per-token dynamic int8 activations
              (opt-in CT_TPU_W4_ACT=int8)

plus the mean per-token KL(dense || mode) — the direct execution-divergence
measure (NLL deltas can cancel across tokens; KL cannot).

Usage: python benchmarks/nll_parity.py [preset] [tokens]
"""
import sys
import time

sys.path.insert(0, '/root/repo')

PRESET = sys.argv[1] if len(sys.argv) > 1 else "W4A16"
TOKENS = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ct_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measure(preset=PRESET, tokens=TOKENS, batch=8, seq=512, log=print):
    from compressed_tensors_tpu.flags import flag_overrides
    from compressed_tensors_tpu.models.llama import llama_forward
    from compressed_tensors_tpu.models.synthetic import (
        TINYLLAMA_1_1B,
        make_synthetic_llama,
    )
    from compressed_tensors_tpu.ops.fuse import fuse_llama_layers

    config = TINYLLAMA_1_1B
    n_batches = max(1, tokens // (batch * seq))

    rng = np.random.default_rng(0)
    corpus = rng.integers(0, config.vocab_size,
                          size=(n_batches, batch, seq)).astype(np.int32)

    # one underlying checkpoint; each mode executes the same weights
    params_ckpt = make_synthetic_llama(config, preset=preset,
                                       use_kernels=False)
    params_kern = make_synthetic_llama(config, preset=preset,
                                       use_kernels=True)
    params_kern = fuse_llama_layers(params_kern)

    @jax.jit
    def nll_kl_dense(params, ids):
        positions = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
        logits, _ = llama_forward(params, config, ids, positions)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        return jnp.mean(nll), lp

    import functools

    # `mode` is only a jit-cache key: the flags that select the kernel
    # path are read at TRACE time, so each mode must trace separately
    @functools.partial(jax.jit, static_argnames=("mode",))
    def nll_kl_mode(params, ids, ref_lp, mode):
        positions = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
        logits, _ = llama_forward(params, config, ids, positions)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        kl = jnp.sum(jnp.exp(ref_lp) * (ref_lp - lp), -1)
        return jnp.mean(nll), jnp.mean(kl)

    results = {}
    modes = [("dense", params_ckpt, {"enforce_eager": True}),
             ("int4b", params_kern, {"w4_act": "bf16"}),
             ("a8b", params_kern, {"w4_act": "int8"})]

    nll_sums = {m: 0.0 for m, _, _ in modes}
    kl_sums = {m: 0.0 for m, _, _ in modes}
    t0 = time.time()
    for bi in range(n_batches):
        ids = jnp.asarray(corpus[bi])
        ref_nll, ref_lp = nll_kl_dense(params_ckpt, ids)
        nll_sums["dense"] += float(ref_nll)
        for name, params, flags in modes[1:]:
            with flag_overrides(**flags):
                nll, kl = nll_kl_mode(params, ids, ref_lp, mode=name)
            nll_sums[name] += float(nll)
            kl_sums[name] += float(kl)
    n_tok = n_batches * batch * (seq - 1)
    log(f"preset={preset} corpus={n_tok} tokens "
        f"({time.time()-t0:.1f}s)")
    dense = nll_sums["dense"] / n_batches
    results["nll_dense"] = dense
    for name in ("int4b", "a8b"):
        nll = nll_sums[name] / n_batches
        kl = kl_sums[name] / n_batches
        results[f"nll_{name}"] = nll
        results[f"nll_delta_{name}"] = abs(nll - dense)
        results[f"kl_{name}"] = kl
        log(f"  {name}: NLL {nll:.6f} (dense {dense:.6f}, "
            f"delta {abs(nll-dense):.6f}), mean KL {kl:.3e}")
    return results


if __name__ == "__main__":
    measure()


def measure_extra(tokens=8_192, batch=8, seq=512, log=print):
    """W8A8 fused-kernel delta and FP8->int8 transcode delta (config 3's
    accuracy question on v5e): NLL vs the same checkpoint executed on the
    XLA reference path."""
    import functools

    from compressed_tensors_tpu.flags import flag_overrides
    from compressed_tensors_tpu.models.llama import llama_forward
    from compressed_tensors_tpu.models.synthetic import (
        TINYLLAMA_1_1B,
        make_synthetic_llama,
    )
    from compressed_tensors_tpu.ops.fuse import fuse_llama_layers

    config = TINYLLAMA_1_1B
    n_batches = max(1, tokens // (batch * seq))
    rng = np.random.default_rng(1)
    corpus = rng.integers(0, config.vocab_size,
                          size=(n_batches, batch, seq)).astype(np.int32)

    @functools.partial(jax.jit, static_argnames=("tag",))
    def nll_lp(params, ids, tag):
        positions = jnp.broadcast_to(jnp.arange(ids.shape[1]), ids.shape)
        logits, _ = llama_forward(params, config, ids, positions)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        return jnp.mean(nll)

    def run(tag, build_flags, run_flags, use_kernels):
        with flag_overrides(**build_flags):
            params = make_synthetic_llama(
                config, preset=tag.split("/")[0], seed=1,
                use_kernels=use_kernels)
            params = fuse_llama_layers(params)
        tot = 0.0
        for bi in range(n_batches):
            with flag_overrides(**run_flags):
                tot += float(nll_lp(params, jnp.asarray(corpus[bi]),
                                    tag=tag))
        return tot / n_batches

    results = {}
    # W8A8: fused in-kernel act-quant kernel vs the XLA int8 path (same
    # quantization semantics; the delta is pure kernel numerics)
    ref = run("W8A8/xla", {}, {"enforce_eager": True}, use_kernels=False)
    got = run("W8A8/kernel", {}, {}, use_kernels=True)
    results["nll_delta_w8a8_kernel"] = abs(got - ref)
    log(f"  W8A8 kernel-vs-xla NLL delta: {abs(got - ref):.6f}")

    # FP8: the v5e load-time int8 re-grid vs straight fp8 execution
    ref = run("FP8_DYNAMIC/native", {"fp8_transcode": "never"},
              {"enforce_eager": True}, use_kernels=False)
    got = run("FP8_DYNAMIC/transcode", {"fp8_transcode": "always"}, {},
              use_kernels=True)
    results["nll_delta_fp8_transcode"] = abs(got - ref)
    log(f"  FP8 transcode-vs-native NLL delta: {abs(got - ref):.6f}")
    return results
