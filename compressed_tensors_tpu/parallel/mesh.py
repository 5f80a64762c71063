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

__all__ = ["make_mesh", "shard_llama_params", "llama_param_specs"]


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(dev_array, axis_names=("dp", "tp"))


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
}


def _qt_specs(role: str) -> dict[str, P]:
    """PartitionSpecs for each array leaf of a QuantizedTensor by role."""
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


def _shard_qt(qt: QuantizedTensor, role: str, mesh: Mesh) -> QuantizedTensor:
    specs = _qt_specs(role)
    updates = {}
    for fname, spec in specs.items():
        arr = getattr(qt, fname, None)
        if arr is None:
            continue
        # only shard when the dimension divides evenly; otherwise replicate
        ok = True
        for d, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis]
            if d >= arr.ndim or arr.shape[d] % size != 0:
                ok = False
        sharding = NamedSharding(mesh, spec if ok else P())
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
            if isinstance(value, QuantizedTensor):
                new_layer[key] = _shard_qt(value, key, mesh)
            else:
                new_layer[key] = put_repl(value)
        out["layers"].append(new_layer)
    return out


def llama_param_specs(role: str):
    return _qt_specs(role)
