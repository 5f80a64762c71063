"""Fused-projection optimization: concatenate same-input projections
(q/k/v, gate/up) into single quantized matmuls.

This is the vLLM `qkv_proj`/`gate_up_proj` fusion (the reference's matching
layer understands these fused names, ref utils/match.py:422-445) realized at
the engine level: fewer, larger MXU ops per decode step.

Fusion requires identical schemes/formats across the members; otherwise the
layer is left unfused.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from compressed_tensors_tpu.ops.linear import QuantizedTensor

__all__ = ["fuse_quantized_tensors", "fuse_llama_layers", "Static"]


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class Static:
    """Hashable static pytree node (split points must stay static under
    jit — plain ints in a params dict would become traced leaves)."""

    value: tuple


def _concat_field(tensors, field, axis):
    vals = [getattr(t, field) for t in tensors]
    if any(v is None for v in vals):
        return None
    return jnp.concatenate(vals, axis=axis)


def fuse_quantized_tensors(
    tensors: list[QuantizedTensor],
) -> QuantizedTensor | None:
    """Concatenate QuantizedTensors along output features (dim 0).

    Returns None if fusion is unsupported for these tensors (mismatched
    schemes/formats/K, actorder, sparse layers).
    """
    first = tensors[0]
    if any(t.format != first.format for t in tensors):
        return None
    if any(t.scheme != first.scheme for t in tensors):
        return None
    if any(t.shape[1] != first.shape[1] for t in tensors):
        return None
    if any(t.g_idx is not None or t.sparse_values is not None
           for t in tensors):
        return None
    # mixed bias presence would silently drop the present biases
    has_bias = [t.bias is not None for t in tensors]
    if any(has_bias) and not all(has_bias):
        return None

    n_total = sum(t.shape[0] for t in tensors)
    shape = (n_total, first.shape[1])

    kernel_meta = None
    kernel_packed = kernel_scales = kernel_zp = None
    reprepare = False
    if all(t.kernel_packed is not None for t in tensors):
        if any(t.kernel_packed.ndim == 3 for t in tensors):
            # pre-tiled (N/tn, K, tn) w8a8 layouts don't concatenate along
            # a single axis — rebuild the fused kernel layout from the
            # fused checkpoint representation instead
            reprepare = True
        else:
            # kernel layout is K-major: concat along axis 1 (N)
            kernel_packed = _concat_field(tensors, "kernel_packed", axis=1)
            kernel_scales = _concat_field(tensors, "kernel_scales", axis=1)
            kernel_zp = _concat_field(tensors, "kernel_zp", axis=1)
            if first.kernel_meta[0] == "w8a8":
                kind, _, k = first.kernel_meta
                kernel_meta = (kind, n_total, k)
            else:
                kind, _, k, k_pad, group_size, tk = first.kernel_meta
                kernel_meta = (kind, n_total, k, k_pad, group_size, tk)

    fused = dataclasses.replace(
        first,
        weight=_concat_field(tensors, "weight", axis=0),
        weight_packed=_concat_field(tensors, "weight_packed", axis=0),
        scale=_concat_field(tensors, "scale", axis=0),
        zero_point=_concat_field(tensors, "zero_point", axis=0),
        bias=_concat_field(tensors, "bias", axis=0),
        kernel_packed=kernel_packed,
        kernel_scales=kernel_scales,
        kernel_zp=kernel_zp,
        kernel_meta=kernel_meta,
        shape=shape,
    )
    if reprepare:
        from compressed_tensors_tpu.ops.linear import prepare_for_kernels

        fused = prepare_for_kernels(fused)
    return fused


def fuse_llama_layers(params: dict) -> dict:
    """Fuse q/k/v -> qkv_proj and gate/up -> gate_up_proj in every layer
    where the members share a scheme. Unfusable layers stay as-is."""
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        new_layer = dict(layer)
        qkv = [layer.get("q_proj"), layer.get("k_proj"), layer.get("v_proj")]
        if all(isinstance(t, QuantizedTensor) for t in qkv):
            fused = fuse_quantized_tensors(qkv)
            if fused is not None:
                new_layer["qkv_proj"] = fused
                new_layer["qkv_splits"] = Static((
                    qkv[0].shape[0],
                    qkv[0].shape[0] + qkv[1].shape[0],
                ))
                for k in ("q_proj", "k_proj", "v_proj"):
                    del new_layer[k]
        gu = [layer.get("gate_proj"), layer.get("up_proj")]
        if all(isinstance(t, QuantizedTensor) for t in gu):
            fused = fuse_quantized_tensors(gu)
            if fused is not None:
                new_layer["gate_up_proj"] = fused
                new_layer["gate_up_split"] = Static((gu[0].shape[0],))
                for k in ("gate_proj", "up_proj"):
                    del new_layer[k]
        out["layers"].append(new_layer)
    return out
