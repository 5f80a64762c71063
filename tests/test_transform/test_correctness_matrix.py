"""Transform correctness matrix, ported from the reference's
tests/test_transform/factory/test_correctness.py: for every transform
type x randomize x head_dim x batch size, applying the four-transform
quartet (inverse input, weight_input, weight_output, inverse output)
leaves the computed linear function invariant; embedding/linear pairs
cancel through a shared scheme."""

import numpy as np
import pytest

from compressed_tensors_tpu.transform import (
    TransformConfig,
    apply_transform_config,
    apply_transform_weight,
    get_transform_size,
    high_precision_invert,
)
from compressed_tensors_tpu.transform.apply import multihead_matmul
from compressed_tensors_tpu.transform.apply import TransformFactory
from compressed_tensors_tpu.transform.schemas import TransformScheme
from compressed_tensors_tpu.utils.match import ModuleInfo

LINEAR = ModuleInfo("Linear")
EMBEDDING = ModuleInfo("Embedding")

TYPES = ("hadamard", "random-hadamard", "random-matrix")


def _normalized(factory, size):
    """The transform matrix as actually applied (hadamards normalize by
    1/sqrt(n) at application; random matrices apply raw)."""
    w = factory.get_weight(size)
    if factory.normalize:
        return w / np.sqrt(size)
    return w


def _inv(factory, w):
    if factory.normalize:
        return w.T  # normalized hadamard inverse
    return high_precision_invert(w)


@pytest.mark.parametrize("type_", TYPES)
@pytest.mark.parametrize("randomize", (True, False))
@pytest.mark.parametrize("head_dim", (None, 2, 4))
@pytest.mark.parametrize("input_batch_size", (1, 5, 17))
def test_correctness_linear(rng, type_, randomize, head_dim,
                            input_batch_size):
    """y = x @ W.T is invariant under
    (x V^-1) @ (U^T (V W^T)) then U^-1 (ref test_correctness_linear:22)."""
    out_f, in_f = 4, 8
    W = rng.standard_normal((out_f, in_f))
    scheme = TransformScheme(type=type_, randomize=randomize,
                             head_dim=head_dim)
    factory = TransformFactory.from_scheme(scheme, name="", seed=3)

    in_size = get_transform_size("Linear", "input", W.shape,
                                 head_dim=head_dim)
    out_size = get_transform_size("Linear", "output", W.shape,
                                  head_dim=head_dim)
    V = _normalized(factory, in_size)
    U = _normalized(factory, out_size)

    x = rng.standard_normal((input_batch_size, 5, in_f))
    true_output = x @ W.T

    x_t = apply_transform_weight(_inv(factory, V), x, "input", "Linear")
    W_t = apply_transform_weight(V, W, "weight_input", "Linear")
    W_t = apply_transform_weight(U, W_t, "weight_output", "Linear")
    y = apply_transform_weight(_inv(factory, U), x_t @ W_t.T, "output",
                               "Linear")
    np.testing.assert_allclose(true_output, y, atol=1e-5, rtol=0.0)


@pytest.mark.parametrize("type_", TYPES)
@pytest.mark.parametrize("randomize", (True, False))
@pytest.mark.parametrize("embed_loc", ("weight_output",))
@pytest.mark.parametrize("linear_loc", ("weight_input",))
def test_correctness_embedding(rng, type_, randomize, embed_loc,
                               linear_loc):
    """Embedding -> Linear with a shared scheme: the rotation fused into
    the embedding's output cancels against the inverse fused into the
    linear's input (ref test_correctness_embedding:53)."""
    emb = rng.standard_normal((16, 4))
    lin = rng.standard_normal((8, 4))
    ids = rng.integers(0, 16, size=(17, 5))
    true_output = emb[ids] @ lin.T

    modules = {"embed": EMBEDDING, "linear": LINEAR}
    states = {"embed": {"weight": emb.copy()},
              "linear": {"weight": lin.copy()}}
    config = TransformConfig(config_groups={"": TransformScheme(
        type=type_, randomize=randomize,
        apply=[{"targets": ["Embedding"], "location": embed_loc},
               {"targets": ["Linear"], "location": linear_loc,
                "inverse": True}],
    )})
    new_states, online = apply_transform_config(states, modules, config,
                                                seed=11)
    assert not online.get("embed") and not online.get("linear")
    out = new_states["embed"]["weight"][ids] @ new_states["linear"][
        "weight"].T
    np.testing.assert_allclose(true_output, out, atol=1e-5, rtol=0.0)


@pytest.mark.parametrize("type_", TYPES)
@pytest.mark.parametrize("randomize", (True, False))
@pytest.mark.parametrize("head_dim", (4, 8))
def test_correctness_attention_heads(rng, type_, randomize, head_dim):
    """Per-head (block-diagonal) value/output rotation pairs cancel: a
    head_dim transform fused into v_proj's output rows cancels against
    the inverse fused into o_proj's input (ref
    test_correctness_attention_heads:115)."""
    num_heads = 2
    hidden = num_heads * head_dim
    v_proj = rng.standard_normal((hidden, hidden))
    o_proj = rng.standard_normal((hidden, hidden))
    x = rng.standard_normal((5, hidden))
    true_output = (x @ v_proj.T) @ o_proj.T

    modules = {"v_proj": LINEAR, "o_proj": LINEAR}
    states = {"v_proj": {"weight": v_proj.copy()},
              "o_proj": {"weight": o_proj.copy()}}
    config = TransformConfig(config_groups={"": TransformScheme(
        type=type_, randomize=randomize, head_dim=head_dim,
        apply=[{"targets": ["v_proj"], "location": "weight_output"},
               {"targets": ["o_proj"], "location": "weight_input",
                "inverse": True}],
    )})
    new_states, _ = apply_transform_config(states, modules, config, seed=5)
    out = (x @ new_states["v_proj"]["weight"].T) @ new_states["o_proj"][
        "weight"].T
    np.testing.assert_allclose(true_output, out, atol=1e-5, rtol=0.0)


@pytest.mark.parametrize("type_", TYPES)
def test_correctness_linear_with_bias(rng, type_):
    """WEIGHT_OUTPUT also rotates the bias: y' = (UW)x + Ub
    (ref test_correctness_linear_with_bias:153, factory/base.py:127-146)."""
    W = rng.standard_normal((8, 8))  # hadamard orders exist only for
    b = rng.standard_normal(8)       # 1, 2, and multiples of 4
    x = rng.standard_normal((5, 8))
    true_output = x @ W.T + b

    modules = {"up": LINEAR, "down": LINEAR}
    down = rng.standard_normal((8, 8))
    states = {"up": {"weight": W.copy(), "bias": b.copy()},
              "down": {"weight": down.copy()}}
    config = TransformConfig(config_groups={"": TransformScheme(
        type=type_,
        apply=[{"targets": ["up"], "location": "weight_output"},
               {"targets": ["down"], "location": "weight_input",
                "inverse": True}],
    )})
    new_states, _ = apply_transform_config(states, modules, config, seed=9)
    # the rotated bias must ride along so the next (inverse-rotated)
    # linear recovers the original function
    rotated = x @ new_states["up"]["weight"].T + new_states["up"]["bias"]
    out = rotated @ new_states["down"]["weight"].T
    np.testing.assert_allclose(out, true_output @ down.T, atol=1e-5,
                               rtol=0.0)


@pytest.mark.parametrize("type_", TYPES)
@pytest.mark.parametrize("randomize", (True, False))
@pytest.mark.parametrize("head_dim", (4, 8))
def test_correctness_attention_heads_with_bias(rng, type_, randomize,
                                               head_dim):
    """R2 head-wise rotation with a v_proj bias (Qwen2-style): the bias is
    rotated with the weight so o_proj's WEIGHT_INPUT inverse still cancels
    (ref test_correctness_attention_heads_with_bias:191)."""
    num_heads = 2
    hidden = num_heads * head_dim
    v_proj = rng.standard_normal((hidden, hidden))
    v_bias = rng.standard_normal((hidden,))
    o_proj = rng.standard_normal((hidden, hidden))
    x = rng.standard_normal((5, hidden))
    true_output = (x @ v_proj.T + v_bias) @ o_proj.T

    modules = {"v_proj": LINEAR, "o_proj": LINEAR}
    states = {"v_proj": {"weight": v_proj.copy(), "bias": v_bias.copy()},
              "o_proj": {"weight": o_proj.copy()}}
    config = TransformConfig(config_groups={"": TransformScheme(
        type=type_, randomize=randomize, head_dim=head_dim,
        apply=[{"targets": ["v_proj"], "location": "weight_output"},
               {"targets": ["o_proj"], "location": "weight_input",
                "inverse": True}],
    )})
    new_states, _ = apply_transform_config(states, modules, config, seed=7)
    out = (x @ new_states["v_proj"]["weight"].T
           + new_states["v_proj"]["bias"]) @ new_states["o_proj"][
        "weight"].T
    np.testing.assert_allclose(true_output, out, atol=1e-5, rtol=0.0)


@pytest.mark.parametrize("type_", ("hadamard", "random-hadamard"))
@pytest.mark.parametrize("randomize", (True, False))
@pytest.mark.parametrize("head_dim", (4, 8))
def test_correctness_query_key_locations(rng, type_, randomize, head_dim):
    """R3 online rotation at Q_ATTN/K_CACHE: rotating post-RoPE q and k by
    the same ORTHONORMAL per-head transform leaves q k^T scores invariant
    (ref test_correctness_query_key_locations:240 — hadamard types only,
    like the reference: a general random matrix is not orthogonal, so
    q W W^T k^T != q k^T)."""
    num_heads = 2
    seq, hidden = 5, num_heads * head_dim
    q = rng.standard_normal((seq, hidden))
    k = rng.standard_normal((seq, hidden))
    true_scores = (q.reshape(seq, num_heads, head_dim).transpose(1, 0, 2)
                   @ k.reshape(seq, num_heads, head_dim).transpose(1, 2, 0))

    modules = {"attn": ModuleInfo("LlamaAttention")}
    states = {"attn": {}}
    config = TransformConfig(config_groups={"": TransformScheme(
        type=type_, randomize=randomize, head_dim=head_dim,
        apply=[{"targets": ["LlamaAttention"], "location": "q_attn"},
               {"targets": ["LlamaAttention"], "location": "k_cache"}],
    )})
    _, online = apply_transform_config(states, modules, config, seed=9)
    kinds = {t.location for t in online["attn"]}
    assert kinds == {"q_attn", "k_cache"}

    def rotate(x, t):
        return (multihead_matmul(
            x.reshape(seq, num_heads, head_dim), t.weight) * t.scale
        ).reshape(seq, hidden)

    q_t = rotate(q, next(t for t in online["attn"]
                         if t.location == "q_attn"))
    k_t = rotate(k, next(t for t in online["attn"]
                         if t.location == "k_cache"))
    scores = (q_t.reshape(seq, num_heads, head_dim).transpose(1, 0, 2)
              @ k_t.reshape(seq, num_heads, head_dim).transpose(1, 2, 0))
    np.testing.assert_allclose(true_scores, scores, atol=1e-5, rtol=0.0)
