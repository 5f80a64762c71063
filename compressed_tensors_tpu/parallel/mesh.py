"""Device mesh + sharding rules for compressed Llama params.

Replaces the reference's entire distributed layer (`distributed/`,
`offload/cache/dist_*` — broadcast-replication over torch.distributed,
SURVEY.md §2.10) with the idiomatic TPU equivalent: a `jax.sharding.Mesh`
with (dp, tp) axes and NamedShardings on the compressed weight pytrees.
XLA's GSPMD inserts the all-gather/reduce-scatter collectives over ICI.

Tensor-parallel layout (megatron-style):
- q/k/v/gate/up projections: shard output features (dim 0 of (N, K))
- o/down projections: shard input features (dim 1) -> psum on output
- packed int32 weights shard the same logical dim (packed columns scale
  by num_bits/32; group-scale tensors shard on the same axis as their
  packed dim)
- embed/lm_head: shard vocab dim
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from compressed_tensors_tpu.ops.linear import QuantizedTensor

__all__ = ["make_mesh", "shard_llama_params", "llama_param_specs",
           "shard_kv_cache"]


def make_mesh(dp: int = 1, tp: int = 1, pp: int = 1, ep: int = 1,
              sp: int = 1, devices=None) -> Mesh:
    """Build a device mesh with up to five parallelism axes.

    Axis order (outer->inner) = (dp, pp, sp, ep, tp): tp is innermost so its
    collectives (the per-matmul all-gathers/reduce-scatters) ride the
    fastest ICI links; dp outermost so data-parallel traffic (none at
    inference, gradient reductions in calibration) crosses the slowest.
    Axes of size 1 are kept (named) so the same PartitionSpecs work for any
    configuration.
    """
    devices = devices if devices is not None else jax.devices()
    n = dp * pp * sp * ep * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(dp, pp, sp, ep, tp)
    return Mesh(dev_array, axis_names=("dp", "pp", "sp", "ep", "tp"))


# role -> which logical weight dim is tp-sharded (0 = out features / rows,
# 1 = in features / cols, None = replicated)
_ROLE_SHARD_DIM = {
    "q_proj": 0,
    "k_proj": 0,
    "v_proj": 0,
    "gate_proj": 0,
    "up_proj": 0,
    "o_proj": 1,
    "down_proj": 1,
    "lm_head": 0,
    # fused projections (engine layout): output-feature sharded like their
    # members; GSPMD reshards the q/k/v (gate/up) output slices as needed
    "qkv_proj": 0,
    "gate_up_proj": 0,
}


def _qt_specs(role: str) -> dict[str, P]:
    """PartitionSpecs for each array leaf of a QuantizedTensor by role."""
    if role.startswith("experts."):
        # stacked 3D expert weights: expert dim over "ep", then the same
        # megatron split as the dense FFN over "tp"
        dim = _ROLE_SHARD_DIM.get(role.split(".", 1)[1])
        if dim is None:
            return {}
        main = P("ep", "tp", None) if dim == 0 else P("ep", None, "tp")
        qparam = P("ep", "tp", None) if dim == 0 else P("ep", None, "tp")
        return {
            "weight": main,
            "weight_packed": main,
            "scale": qparam,
            "zero_point": qparam,
            "bias": P("ep", "tp") if dim == 0 else P("ep", None),
            "g_idx": P("ep", None) if dim == 0 else P("ep", "tp"),
        }
    dim = _ROLE_SHARD_DIM.get(role)
    if dim is None:
        return {}
    row = P("tp", None)
    col = P(None, "tp")
    main = row if dim == 0 else col
    specs = {
        "weight": main,
        "weight_packed": main,
        # kernel layout is K-major (K', N): sharded dim transposes
        "kernel_packed": col if dim == 0 else row,
        "kernel_scales": col if dim == 0 else row,
        "kernel_zp": col if dim == 0 else row,
    }
    if dim == 0:
        specs["scale"] = row
        specs["zero_point"] = row
        specs["bias"] = P("tp")
        specs["sparse_values"] = row
        specs["sparse_bitmask"] = row
    else:
        # scales shard along their group axis (dim 1)
        specs["scale"] = col
        specs["zero_point"] = col
        specs["bias"] = P(None)
        specs["sparse_values"] = col
        specs["sparse_bitmask"] = col
        specs["g_idx"] = P("tp")
    return specs


def _sanitize_spec(arr, spec: P, mesh: Mesh) -> P:
    """Drop spec axes that don't divide the array dim (per-dim fallback, so
    e.g. a (E, N, 1) channel scale keeps its "ep" sharding even though its
    trailing dim can't take "tp")."""
    out = []
    for d, axis in enumerate(spec):
        if axis is None or d >= arr.ndim:
            out.append(None)
            continue
        size = mesh.shape[axis]
        out.append(axis if arr.shape[d] % size == 0 else None)
    return P(*out)


def _shard_qt(qt: QuantizedTensor, role: str, mesh: Mesh) -> QuantizedTensor:
    specs = _qt_specs(role)
    updates = {}
    for fname, spec in specs.items():
        arr = getattr(qt, fname, None)
        if arr is None:
            continue
        sharding = NamedSharding(mesh, _sanitize_spec(arr, spec, mesh))
        updates[fname] = jax.device_put(arr, sharding)
    # replicate everything not explicitly sharded
    for fname in ("weight", "weight_packed", "scale", "zero_point", "g_idx",
                  "global_scale", "input_global_scale", "bias",
                  "sparse_values", "sparse_bitmask", "kernel_packed",
                  "kernel_scales", "kernel_zp"):
        if fname in updates:
            continue
        arr = getattr(qt, fname, None)
        if arr is None:
            continue
        updates[fname] = jax.device_put(arr, NamedSharding(mesh, P()))
    return dataclasses.replace(qt, **updates)


def shard_llama_params(params: dict, mesh: Mesh) -> dict:
    """Apply TP NamedShardings to a Llama params pytree."""
    repl = NamedSharding(mesh, P())

    def put_repl(a):
        return jax.device_put(a, repl)

    out: dict = {}
    emb = params["embed_tokens"]
    out["embed_tokens"] = jax.device_put(
        emb, NamedSharding(mesh, P("tp", None))
        if emb.shape[0] % mesh.shape["tp"] == 0 else repl
    )
    out["norm"] = put_repl(params["norm"])

    lm = params["lm_head"]
    if isinstance(lm, QuantizedTensor):
        out["lm_head"] = _shard_qt(lm, "lm_head", mesh)
    else:
        out["lm_head"] = jax.device_put(
            lm, NamedSharding(mesh, P("tp", None))
            if lm.shape[0] % mesh.shape["tp"] == 0 else repl
        )

    out["layers"] = []
    for layer in params["layers"]:
        new_layer = {}
        for key, value in layer.items():
            if key == "moe":
                moe = {"router": put_repl(value["router"])}
                moe["experts"] = {
                    name: _shard_qt(qt, f"experts.{name}", mesh)
                    for name, qt in value["experts"].items()
                }
                if "shared_expert" in value:
                    moe["shared_expert"] = {
                        name: _shard_qt(qt, name, mesh)
                        for name, qt in value["shared_expert"].items()
                    }
                new_layer[key] = moe
            elif isinstance(value, QuantizedTensor):
                new_layer[key] = _shard_qt(value, key, mesh)
            else:
                new_layer[key] = put_repl(value)
        out["layers"].append(new_layer)
    return out


def llama_param_specs(role: str):
    return _qt_specs(role)


def shard_kv_cache(cache, mesh: Mesh):
    """NamedShardings for a (dense or paged) KV cache.

    The pool shards on its kv-head axis over "tp" (each tp rank owns the KV
    rows of its own attention-head shard) and — dense layout only — on the
    batch axis over "dp". Page tables and per-slot lengths replicate: the
    engine's host-side slot/page bookkeeping stays mesh-oblivious
    (SURVEY §7 step 7: multi-host serving with unchanged host logic).
    Axes that don't divide fall back to replication per dimension.
    """
    from compressed_tensors_tpu.models.llama import PagedKVCache

    repl = NamedSharding(mesh, P())

    def put(a, spec):
        return jax.device_put(
            a, NamedSharding(mesh, _sanitize_spec(a, spec, mesh))
        )

    if isinstance(cache, PagedKVCache):
        spec = P(None, None, "tp", None, None)
        return dataclasses.replace(
            cache,
            k=put(cache.k, spec),
            v=put(cache.v, spec),
            tables=jax.device_put(cache.tables, repl),
            lengths=jax.device_put(cache.lengths, repl),
        )
    spec = P(None, "dp", "tp", None, None)
    return dataclasses.replace(
        cache,
        k=put(cache.k, spec),
        v=put(cache.v, spec),
        lengths=jax.device_put(cache.lengths, repl),
    )
