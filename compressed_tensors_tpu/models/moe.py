"""Mixture-of-Experts layer: top-k routing with sort-based capacity dispatch,
run-compressed expert FFNs.

TPU-first design notes:
- Static shapes throughout: tokens are sorted by expert id and scattered into
  an (E, capacity, H) dispatch buffer (GShard-style), so the expert compute is
  one batched matmul over the expert dimension — MXU-friendly, no ragged
  shapes, no data-dependent control flow.
- Expert weights are a single `QuantizedTensor` whose array leaves carry a
  leading expert dim (E, ...). The reference packs exactly this 3D layout
  slice-wise (ref compressors/pack_quantized/helpers.py:44-51); here it is
  consumed directly by batched dequant+matmul.
- Expert parallelism falls out of GSPMD: shard the expert dim of the stacked
  weights over the "ep" mesh axis (parallel/mesh.py) and XLA turns the
  dispatch scatter / combine gather into all-to-alls over ICI.
- The router stays dense/unquantized, matching the reference's vLLM aliasing
  that exempts MoE gates (ref quantization/quant_config.py:370-382).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from compressed_tensors_tpu.models.config import LlamaConfig
from compressed_tensors_tpu.ops.linear import (
    quantized_matmul,
    quantized_matmul_experts,
)

__all__ = ["moe_mlp", "moe_capacity"]


def moe_capacity(num_tokens: int, num_experts: int, top_k: int,
                 capacity_factor: float = 1.25) -> int:
    """Static per-expert token capacity: ceil(T*k/E * f), sublane-aligned."""
    c = int(np.ceil(num_tokens * top_k / num_experts * capacity_factor))
    c = max(8, int(np.ceil(c / 8) * 8))
    return min(c, max(8, int(np.ceil(num_tokens * top_k / 8) * 8)))


def _route(tokens: jnp.ndarray, router_w: jnp.ndarray, config: LlamaConfig):
    """Top-k routing. Returns (weights (T,k) f32, expert ids (T,k) i32)."""
    logits = jax.lax.dot_general(
        tokens.astype(jnp.float32), router_w.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, E)
    probs = jax.nn.softmax(logits, axis=-1)
    top_w, top_i = jax.lax.top_k(probs, config.num_experts_per_tok)
    if config.norm_topk_prob:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    return top_w, top_i.astype(jnp.int32)


def moe_mlp(layer: dict, x: jnp.ndarray, config: LlamaConfig,
            capacity_factor: float = 1.25,
            use_kernels: bool = True) -> jnp.ndarray:
    """MoE FFN block: route -> dispatch -> expert FFN -> weighted combine.

    `layer["moe"]` holds: "router" (E, H) dense array, "experts" dict of
    stacked QuantizedTensors {gate_proj, up_proj, down_proj} with leading
    expert dim, and optionally "shared_expert" {gate,up,down}_proj for
    Qwen/DeepSeek-style always-on experts.
    """
    moe = layer["moe"]
    B, S, H = x.shape
    T = B * S
    E = config.num_local_experts
    k = config.num_experts_per_tok
    tokens = x.reshape(T, H)

    top_w, top_i = _route(tokens, moe["router"], config)

    # flatten (token, k) slots and sort by expert id
    Tk = T * k
    flat_e = top_i.reshape(Tk)
    flat_w = top_w.reshape(Tk)
    sort_idx = jnp.argsort(flat_e)              # stable
    e_sorted = flat_e[sort_idx]                 # (Tk,)
    tok_sorted = sort_idx // k                  # source token per slot
    w_sorted = flat_w[sort_idx]

    # position of each slot within its expert's group
    counts = jnp.bincount(flat_e, length=E)     # (E,)
    starts = jnp.cumsum(counts) - counts
    pos = jnp.arange(Tk, dtype=jnp.int32) - starts[e_sorted].astype(jnp.int32)

    C = moe_capacity(T, E, k, capacity_factor)

    # dispatch: (E, C, H); slots past capacity are dropped (mode="drop")
    dispatched = jnp.zeros((E, C, H), dtype=x.dtype)
    dispatched = dispatched.at[e_sorted, pos].set(
        tokens[tok_sorted], mode="drop"
    )

    experts = moe["experts"]
    gate = quantized_matmul_experts(dispatched, experts["gate_proj"])
    up = quantized_matmul_experts(dispatched, experts["up_proj"])
    y = quantized_matmul_experts(jax.nn.silu(gate) * up,
                                 experts["down_proj"])  # (E, C, H)

    # combine: gather each slot's expert output, weight, sum over k slots
    keep = (pos < C)[:, None]
    out_sorted = y.at[e_sorted, pos].get(mode="fill", fill_value=0)
    out_sorted = jnp.where(keep, out_sorted, 0)
    contrib = out_sorted.astype(jnp.float32) * w_sorted[:, None]
    out = jnp.zeros((T, H), dtype=jnp.float32).at[tok_sorted].add(contrib)
    out = out.astype(x.dtype)

    shared = moe.get("shared_expert")
    if shared is not None:
        g = quantized_matmul(tokens, shared["gate_proj"], use_kernels)
        u = quantized_matmul(tokens, shared["up_proj"], use_kernels)
        out = out + quantized_matmul(jax.nn.silu(g) * u,
                                     shared["down_proj"], use_kernels)

    return out.reshape(B, S, H)
