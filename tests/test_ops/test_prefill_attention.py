"""Flash prefill-attention kernel vs jnp reference (interpret mode on CPU)."""


from compressed_tensors_tpu.flags import set_flags

set_flags(pallas_interpret=True)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.ops.kernels.prefill_attention import (
    prefill_attention,
)


def _reference(q, k, v):
    """Dense causal GQA attention (the model's jnp path)."""
    B, S, H, D = q.shape
    KVH = k.shape[2]
    rep = H // KVH
    qg = q.reshape(B, S, KVH, rep, D).astype(np.float32)
    kk = np.transpose(np.asarray(k, np.float32), (0, 2, 1, 3))  # (B,KVH,S,D)
    vv = np.transpose(np.asarray(v, np.float32), (0, 2, 1, 3))
    scores = np.einsum("bskrd,bktd->bkrst", qg, kk) / np.sqrt(D)
    mask = np.tril(np.ones((S, S), bool))
    scores = np.where(mask[None, None, None], scores, -1e30)
    scores -= scores.max(-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("bkrst,bktd->bskrd", p, vv)
    return out.reshape(B, S, H, D)


@pytest.mark.parametrize("shape", [
    # (B, S, H, KVH, D)
    (2, 16, 4, 2, 64),       # unaligned S, padded D
    (1, 128, 8, 8, 128),     # MHA, tile-exact
    (2, 200, 8, 2, 128),     # GQA rep=4, S not multiple of tile
    (1, 300, 4, 1, 64),      # MQA, multi-q-tile causal skipping
])
def test_prefill_matches_reference(rng, shape):
    B, S, H, KVH, D = shape
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, KVH, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, KVH, D)), dtype=jnp.float32)

    got = np.asarray(prefill_attention(q, k, v))
    want = _reference(q, k, v)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_prefill_path_in_llama_forward(rng):
    """llama_forward with fresh_prefill + interpret kernels == jnp path."""
    from compressed_tensors_tpu.models.config import LlamaConfig
    from compressed_tensors_tpu.models.llama import llama_forward
    from compressed_tensors_tpu.models.synthetic import make_synthetic_llama

    config = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16,
    )
    params = make_synthetic_llama(config, preset="UNQUANTIZED",
                                  use_kernels=False, dtype=jnp.float32)
    ids = jnp.arange(20, dtype=jnp.int32).reshape(2, 10)
    pos = jnp.broadcast_to(jnp.arange(10), (2, 10))

    want, cache_w = llama_forward(params, config, ids, pos,
                                  fresh_prefill=False)
    got, cache_g = llama_forward(params, config, ids, pos,
                                 fresh_prefill=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    # cache writes agree (layer 2's K/V sees layer 1's attention output, so
    # only float reduction-order noise is tolerated)
    np.testing.assert_allclose(np.asarray(cache_g.k), np.asarray(cache_w.k),
                               atol=1e-5)


def test_prefill_with_quantized_kv_cache(rng):
    """Quantized KV (k_scale/v_scale): flash path must attend over the QDQ'd
    K/V exactly like the jnp path."""
    from compressed_tensors_tpu.models.config import LlamaConfig
    from compressed_tensors_tpu.models.llama import (
        init_kv_cache,
        llama_forward,
    )
    from compressed_tensors_tpu.models.synthetic import make_synthetic_llama

    config = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16,
    )
    params = make_synthetic_llama(config, preset="UNQUANTIZED",
                                  use_kernels=False, dtype=jnp.float32)
    for layer in params["layers"]:
        layer["k_scale"] = jnp.asarray([0.02], jnp.float32)
        layer["v_scale"] = jnp.asarray([0.02], jnp.float32)

    ids = jnp.arange(16, dtype=jnp.int32).reshape(2, 8)
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    cache = init_kv_cache(config, 2, 16, dtype=jnp.float32,
                          cache_dtype=jnp.int8)
    want, _ = llama_forward(params, config, ids, pos, cache,
                            fresh_prefill=False)
    cache = init_kv_cache(config, 2, 16, dtype=jnp.float32,
                          cache_dtype=jnp.int8)
    got, _ = llama_forward(params, config, ids, pos, cache,
                           fresh_prefill=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
