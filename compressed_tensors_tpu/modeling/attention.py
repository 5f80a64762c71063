"""Attention + KV-cache quantization hooks.

Functional analogue of `modeling/{attention,kvcache}.py` (ref
attention.py:31-110, kvcache.py:29-124): the reference registers a hooked
attention implementation that quantizes the post-RoPE query and a
QuantizedKVCache that quantizes keys/values on update, exposing
q_scale/k_scale/v_scale parameters (what vLLM consumes for FP8 KV cache).

Here the same contract is a pure state object + functions the engine calls
at the same points (post-RoPE, pre-cache-write), plus hook registries for
calibration/transforms (the role of register_{query,key,value}_hook).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from compressed_tensors_tpu.ops.qparams import calculate_qparams
from compressed_tensors_tpu.quantization.quant_args import QuantizationArgs
from compressed_tensors_tpu.quantization.quant_scheme import QuantizationScheme

__all__ = [
    "AttentionQuantState",
    "validate_attention_scheme",
    "initialize_hooked_attention",
    "initialize_hooked_kv_cache",
    "quantize_post_rope",
    "calibrate_kv_scales",
    "register_query_hook",
    "register_key_hook",
    "register_value_hook",
]

Hook = Callable[[jnp.ndarray], Optional[jnp.ndarray]]


@dataclasses.dataclass
class AttentionQuantState:
    """Per-attention-module quantization state (q/k/v scales + scheme).

    Serialized artifact parity: `q_scale`, `k_scale`, `v_scale` parameters
    on attention modules (ref quant_metadata.py:13-16)."""

    scheme: QuantizationScheme | None = None
    q_scale: jnp.ndarray | None = None
    k_scale: jnp.ndarray | None = None
    v_scale: jnp.ndarray | None = None
    query_hooks: list = dataclasses.field(default_factory=list)
    key_hooks: list = dataclasses.field(default_factory=list)
    value_hooks: list = dataclasses.field(default_factory=list)

    @property
    def args(self) -> QuantizationArgs | None:
        return self.scheme.input_activations if self.scheme else None


def validate_attention_scheme(scheme: QuantizationScheme) -> None:
    """Attention schemes may only quantize activations (q/k/v states) —
    ref _validate_attention_scheme (initialize.py:336-349)."""
    if scheme.weights is not None:
        raise ValueError(
            "Cannot apply weight quantization to attention. Instead, "
            "target the (q|k|v)_proj submodule layers of attention"
        )
    if scheme.input_activations is None:
        raise ValueError(
            "Cannot apply attention quantization without specifying "
            "input activations"
        )
    if scheme.output_activations is not None:
        raise ValueError("Cannot apply output quantization to attention")


def initialize_hooked_attention(
    kv_cache_scheme: QuantizationArgs | None = None,
    quantize_query: bool = False,
    num_heads: int | None = None,
    num_kv_heads: int | None = None,
    head_dim: int | None = None,
) -> AttentionQuantState:
    """Create attention quant state with q/k/v scales
    (ref initialize_hooked_attention attention.py:92-110 +
    initialize_attn_qparams initialize.py:279-334).

    Per-tensor strategies get scalar ``(1,)`` scales. The ``attn_head``
    strategy gets head-shaped scales — q ``(num_heads, 1, 1)``, k/v
    ``(num_kv_heads, 1, 1)`` — matching the reference's observed shape
    ``(heads, None, head_dim)`` (ref initialize.py:303-305).
    """
    scheme = None
    if kv_cache_scheme is not None:
        scheme = QuantizationScheme(
            targets=["re:.*self_attn$"],
            input_activations=kv_cache_scheme,
        )
        validate_attention_scheme(scheme)
    state = AttentionQuantState(scheme=scheme)
    if kv_cache_scheme is not None:
        per_head = kv_cache_scheme.strategy == "attn_head"
        if per_head and (num_heads is None or num_kv_heads is None):
            raise ValueError(
                "attn_head strategy requires num_heads/num_kv_heads "
                "(ref get_num_attn_heads/get_num_kv_heads)"
            )

        def _ones(h):
            return (jnp.ones((h, 1, 1), dtype=jnp.float32) if per_head
                    else jnp.ones((1,), dtype=jnp.float32))

        state.k_scale = _ones(num_kv_heads)
        state.v_scale = _ones(num_kv_heads)
        if quantize_query:
            state.q_scale = _ones(num_heads)
    return state


# the reference's initialize_hooked_kv_cache wires the same state minus the
# query path (ref kvcache.py:114-124)
def initialize_hooked_kv_cache(
    kv_cache_scheme: QuantizationArgs,
) -> AttentionQuantState:
    return initialize_hooked_attention(kv_cache_scheme, quantize_query=False)


def register_query_hook(state: AttentionQuantState, hook: Hook) -> None:
    """Hook over post-RoPE queries (ref attention.py:116)."""
    state.query_hooks.append(hook)


def register_key_hook(state: AttentionQuantState, hook: Hook) -> None:
    """Hook over pre-cache keys (ref kvcache.py:130-150)."""
    state.key_hooks.append(hook)


def register_value_hook(state: AttentionQuantState, hook: Hook) -> None:
    """Hook over pre-cache values (ref kvcache.py:152-173)."""
    state.value_hooks.append(hook)


def _apply_hooks(hooks: list, value: jnp.ndarray) -> jnp.ndarray:
    for hook in hooks:
        out = hook(value)
        if out is not None:
            value = out
    return value


def quantize_post_rope(
    state: AttentionQuantState,
    query: jnp.ndarray | None = None,
    key: jnp.ndarray | None = None,
    value: jnp.ndarray | None = None,
):
    """Apply hooks + fake-quantization at the reference's hook points:
    post-RoPE query (attention.py:65), pre-cache key/value
    (kvcache.py:65-66). Returns the (possibly quantized) tensors."""
    from compressed_tensors_tpu.ops.quantize import fake_quantize

    args = state.args

    def _fq(v, scale):
        if v is None:
            return None
        if args is None or scale is None:
            return v
        if scale.size > 1:
            # head-shaped (H, 1, 1) scales over our (B, S, H, D) layout:
            # align the head axis for broadcasting ((H, 1) -> (..., H, D))
            scale = scale.reshape(-1, 1)
        return fake_quantize(v, scale, None, args).astype(v.dtype)

    if query is not None:
        query = _apply_hooks(state.query_hooks, query)
        query = _fq(query, state.q_scale)
    if key is not None:
        key = _apply_hooks(state.key_hooks, key)
        key = _fq(key, state.k_scale)
    if value is not None:
        value = _apply_hooks(state.value_hooks, value)
        value = _fq(value, state.v_scale)
    return query, key, value


def calibrate_kv_scales(
    state: AttentionQuantState,
    keys: jnp.ndarray,
    values: jnp.ndarray,
    queries: jnp.ndarray | None = None,
) -> AttentionQuantState:
    """Min-max calibration of k/v (and optionally q) scales from observed
    post-RoPE tensors ((B, S, H, D) layout). Per-tensor strategies reduce
    over everything; attn_head reduces per head -> (H, 1, 1) scales."""
    args = state.args
    if args is None:
        return state
    per_head = args.strategy == "attn_head"

    def _scale(v):
        if per_head:
            mn = jnp.min(v, axis=(0, 1, 3))   # (H,)
            mx = jnp.max(v, axis=(0, 1, 3))
            scale, _ = calculate_qparams(mn, mx, args)
            return scale.reshape(-1, 1, 1).astype(jnp.float32)
        scale, _ = calculate_qparams(jnp.min(v), jnp.max(v), args)
        return scale.astype(jnp.float32)

    state.k_scale = _scale(keys)
    state.v_scale = _scale(values)
    if queries is not None and state.q_scale is not None:
        state.q_scale = _scale(queries)
    return state
