"""DeepSeek-style MLA attention: absorbed-decode (fused kernel over the
latent cache) vs the non-absorbed eager path, latent cache shape, and
generate consistency."""

import sys
from pathlib import Path

from compressed_tensors_tpu.flags import set_flags

set_flags(pallas_interpret=True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
from testing_utils import make_tiny_llama_checkpoint  # noqa: E402

from compressed_tensors_tpu.engine import greedy_generate  # noqa: E402
from compressed_tensors_tpu.models import (  # noqa: E402
    init_kv_cache,
    llama_forward,
    load_llama_params,
)

MLA_CONFIG = {
    "model_type": "deepseek_v3",
    "vocab_size": 256,
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 4,
    "q_lora_rank": 32,
    "kv_lora_rank": 32,
    "qk_nope_head_dim": 16,
    "qk_rope_head_dim": 8,
    "v_head_dim": 16,
    "rope_theta": 10000.0,
    "max_position_embeddings": 128,
}

W4A16_G16 = {
    "config_groups": {
        "group_0": {
            "targets": ["Linear"],
            "weights": {"num_bits": 4, "type": "int", "strategy": "group",
                        "group_size": 16, "symmetric": True},
        }
    },
    "format": "pack-quantized",
    "ignore": ["lm_head"],
    "quant_method": "compressed-tensors",
}


def _setup(rng, tmp_path, model_config=MLA_CONFIG):
    save_dir, _ = make_tiny_llama_checkpoint(
        tmp_path, rng, W4A16_G16, model_config=model_config)
    return load_llama_params(save_dir, run_compressed=True,
                             dtype=jnp.float32)


def test_mla_config_and_cache_shape(rng, tmp_path):
    params, config, _ = _setup(rng, tmp_path)
    assert config.is_mla and config.kv_lora_rank == 32
    assert "kv_a_proj_with_mqa" in params["layers"][0]
    assert "q_a_proj" in params["layers"][0]
    cache = init_kv_cache(config, 2, 16, dtype=jnp.float32)
    # one latent head, lane-padded latent width (32 + 8 -> 128)
    assert cache.k.shape == (2, 2, 1, 64, 128)


def _decode_logits(params, config, ids, fused):
    B, S = ids.shape
    cache = init_kv_cache(config, B, S + 4, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    logits, cache = llama_forward(params, config, jnp.asarray(ids),
                                  positions, cache, use_kernels=fused)
    outs = []
    tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    for _ in range(3):
        logits, cache = llama_forward(
            params, config, tok[:, None], cache.lengths[:, None], cache,
            use_kernels=fused,
        )
        outs.append(np.asarray(logits[:, 0], np.float32))
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    return np.stack(outs)


def test_mla_absorbed_decode_matches_eager(rng, tmp_path):
    """Fused absorbed-matmul decode over the latent cache == non-absorbed
    eager attention."""
    params, config, _ = _setup(rng, tmp_path)
    ids = rng.integers(0, config.vocab_size, size=(2, 6))
    fused = _decode_logits(params, config, ids, fused=True)
    eager = _decode_logits(params, config, ids, fused=False)
    np.testing.assert_allclose(fused, eager, atol=2e-3, rtol=1e-2)


def test_mla_no_q_lora_variant(rng, tmp_path):
    """V2-lite style dense q_proj (q_lora_rank null)."""
    cfg = dict(MLA_CONFIG, q_lora_rank=None)
    params, config, _ = _setup(rng, tmp_path, model_config=cfg)
    assert "q_proj" in params["layers"][0]
    ids = rng.integers(0, config.vocab_size, size=(1, 5))
    fused = _decode_logits(params, config, ids, fused=True)
    eager = _decode_logits(params, config, ids, fused=False)
    np.testing.assert_allclose(fused, eager, atol=2e-3, rtol=1e-2)


def _np_interleaved_rope(x, pos, theta):
    """GPT-J-style interleaved rotary embedding: pairs (x[2i], x[2i+1])
    rotated with frequency i — the DeepSeek V2/V3 training convention (HF
    apply_rotary_pos_emb_interleave; vLLM is_neox_style=False)."""
    d = x.shape[-1]
    inv = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
    f = pos[..., None].astype(np.float64) * inv       # (..., d/2)
    cos, sin = np.cos(f), np.sin(f)
    x1, x2 = x[..., 0::2], x[..., 1::2]
    out = np.empty_like(x)
    out[..., 0::2] = x1 * cos - x2 * sin
    out[..., 1::2] = x2 * cos + x1 * sin
    return out


def _np_rms(x, eps):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps)


def _np_mla_reference(states, cfg, ids):
    """Pure-numpy MLA forward with interleaved rope on the raw checkpoint
    weights (norm weights are all ones in the test checkpoint)."""
    c = MLA_CONFIG | cfg
    h, nope = c["num_attention_heads"], c["qk_nope_head_dim"]
    rope_d, r, vd = c["qk_rope_head_dim"], c["kv_lora_rank"], c["v_head_dim"]
    qk_d = nope + rope_d
    eps, theta = 1e-5, c["rope_theta"]

    def w(name):
        return np.asarray(states[name]["weight"], np.float64)

    x = np.asarray(states["model.embed_tokens"]["weight"], np.float64)[ids]
    B, S, _ = x.shape
    pos = np.broadcast_to(np.arange(S, dtype=np.float64), (B, S))
    for i in range(c["num_hidden_layers"]):
        p = f"model.layers.{i}.self_attn"
        hn = _np_rms(x, eps)
        if c.get("q_lora_rank"):
            qa = _np_rms(hn @ w(f"{p}.q_a_proj").T, eps)
            q = qa @ w(f"{p}.q_b_proj").T
        else:
            q = hn @ w(f"{p}.q_proj").T
        q = q.reshape(B, S, h, qk_d)
        kv_a = hn @ w(f"{p}.kv_a_proj_with_mqa").T
        c_kv = _np_rms(kv_a[..., :r], eps)
        k_pe = _np_interleaved_rope(kv_a[..., r:], pos, theta)  # (B,S,rope)
        q_pe = _np_interleaved_rope(
            q[..., nope:], pos[:, :, None], theta)              # (B,S,h,rope)
        w_kvb = w(f"{p}.kv_b_proj").reshape(h, nope + vd, r)
        k_nope = np.einsum("bsr,hdr->bshd", c_kv, w_kvb[:, :nope])
        v = np.einsum("bsr,hvr->bshv", c_kv, w_kvb[:, nope:])
        k = np.concatenate(
            [k_nope, np.broadcast_to(k_pe[:, :, None], (B, S, h, rope_d))],
            axis=-1)
        qf = np.concatenate([q[..., :nope], q_pe], axis=-1)
        scores = np.einsum("bshd,bthd->bhst", qf, k) / np.sqrt(qk_d)
        mask = np.tril(np.ones((S, S), bool))
        scores = np.where(mask, scores, -np.inf)
        e = np.exp(scores - scores.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        attn = np.einsum("bhst,bthv->bshv", probs, v).reshape(B, S, h * vd)
        x = x + attn @ w(f"{p}.o_proj").T
        pm = f"model.layers.{i}.mlp"
        hn = _np_rms(x, eps)
        gate = hn @ w(f"{pm}.gate_proj").T
        up = hn @ w(f"{pm}.up_proj").T
        silu = gate / (1.0 + np.exp(-gate))
        x = x + (silu * up) @ w(f"{pm}.down_proj").T
    x = _np_rms(x, eps)
    return x @ np.asarray(states["lm_head"]["weight"], np.float64).T


DENSE_CFG = {"config_groups": {}, "format": "dense",
             "quant_method": "compressed-tensors", "ignore": []}


def test_mla_interleaved_rope_convention(rng, tmp_path):
    """Engine logits on a deepseek-style checkpoint match a pure-numpy MLA
    reference that uses *interleaved* rope on the raw weights: the loader's
    interleaved->half output-row permutation reproduces the training
    convention exactly (ADVICE r2; vLLM is_neox_style=False)."""
    for q_lora in (32, None):
        cfg = dict(MLA_CONFIG, q_lora_rank=q_lora)
        save_dir, states = make_tiny_llama_checkpoint(
            tmp_path / f"il_{q_lora}", rng, DENSE_CFG, model_config=cfg)
        params, config, _ = load_llama_params(save_dir, dtype=jnp.float32)
        assert config.rope_interleaved
        ids = rng.integers(0, config.vocab_size, size=(2, 7))
        logits, _ = llama_forward(
            params, config, jnp.asarray(ids),
            jnp.broadcast_to(jnp.arange(7), (2, 7)), None)
        ref = _np_mla_reference(states, cfg, ids)
        np.testing.assert_allclose(np.asarray(logits, np.float64), ref,
                                   atol=5e-4, rtol=1e-3)


def test_mla_quantized_latent_cache(rng, tmp_path):
    """fp8/int8 latent cache via serialized k_scale/v_scale: the absorbed
    fused-kernel decode over the quantized latent cache matches the eager
    path, and both track the unquantized cache (DeepSeek kv-cache quant
    semantics, ref tests/test_modeling/test_deepseekv3_kvcache_quant.py)."""
    import ml_dtypes

    save_dir, _ = make_tiny_llama_checkpoint(
        tmp_path, rng, W4A16_G16, model_config=MLA_CONFIG, kv_scales=True)
    params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                          dtype=jnp.float32)
    assert params["layers"][0]["k_scale"].shape == (1,)
    ids = rng.integers(0, config.vocab_size, size=(2, 6))

    def run(cache_dtype, fused):
        B, S = ids.shape
        cache = init_kv_cache(config, B, S + 4, dtype=jnp.float32,
                              cache_dtype=cache_dtype)
        positions = jnp.broadcast_to(jnp.arange(S), (B, S))
        logits, cache = llama_forward(params, config, jnp.asarray(ids),
                                      positions, cache, use_kernels=fused)
        outs = []
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        for _ in range(3):
            logits, cache = llama_forward(
                params, config, tok[:, None], cache.lengths[:, None], cache,
                use_kernels=fused)
            outs.append(np.asarray(logits[:, 0], np.float32))
            tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        return np.stack(outs)

    for cache_dtype in (jnp.dtype(ml_dtypes.float8_e4m3fn), jnp.int8):
        fused = run(cache_dtype, fused=True)
        eager = run(cache_dtype, fused=False)
        np.testing.assert_allclose(fused, eager, atol=5e-2, rtol=5e-2,
                                   err_msg=str(cache_dtype))
    # quantized-cache logits stay close to the fp32-cache logits
    clean = run(None, fused=True)
    quant = run(jnp.dtype(ml_dtypes.float8_e4m3fn), fused=True)
    assert np.abs(clean - quant).mean() < 0.5


def test_mla_greedy_generate(rng, tmp_path):
    params, config, _ = _setup(rng, tmp_path)
    ids = rng.integers(0, config.vocab_size, size=(1, 4)).astype(np.int32)
    out = greedy_generate(params, config, ids, max_new_tokens=6,
                          dtype=jnp.float32)
    assert out.shape == (1, 10)


def test_mla_paged_engine_matches_dense(rng, tmp_path):
    """MLA + paged KV cache: the page-pool latent cache (paged flash
    decode with a single latent head, gather/scatter prefill) produces
    identical completions to the dense-slab MLA engine."""
    from compressed_tensors_tpu.engine import Request, ServingEngine

    save_dir, _ = make_tiny_llama_checkpoint(
        tmp_path, rng, W4A16_G16, model_config=MLA_CONFIG)
    params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                          dtype=jnp.float32)
    paged = ServingEngine(params, config, dtype=jnp.float32, max_batch=2,
                          max_len=32, prefill_chunk=8, paged=True,
                          page_size=8)
    dense = ServingEngine(params, config, dtype=jnp.float32, max_batch=2,
                          max_len=32, prefill_chunk=8)
    prompts = [rng.integers(0, config.vocab_size, size=(n,)).tolist()
               for n in (6, 9, 4)]
    for i, p in enumerate(prompts):
        paged.submit(Request(request_id=i, prompt_ids=p, max_new_tokens=5))
        dense.submit(Request(request_id=i, prompt_ids=p, max_new_tokens=5))
    got = {c.request_id: c.output_ids for c in paged.run()}
    ref = {c.request_id: c.output_ids for c in dense.run()}
    assert set(got) == {0, 1, 2}
    for rid in ref:
        assert got[rid] == ref[rid], rid
