"""Multi-host process-group management + collectives.

TPU-native replacement for `distributed/utils.py:57-129`: where the
reference picks NCCL/XCCL/Gloo under torchrun, the TPU runtime is
`jax.distributed.initialize` (coordinator discovery from TPU metadata or
env) and collectives are XLA psum/all_gather compiled over ICI/DCN.
Host-side object broadcast (the reference's broadcast_object_list) maps to
`jax.experimental.multihost_utils.broadcast_one_to_all`.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np

__all__ = [
    "init_dist",
    "is_distributed",
    "process_index",
    "process_count",
    "broadcast_object",
    "wait_for_comms",
]

_INITIALIZED = False


def init_dist(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the multi-host runtime.

    On TPU pods the arguments are discovered automatically; for manual
    multi-process runs pass coordinator/num_processes/process_id (or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Safe to call when single-process (no-op).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or (
        int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ
        else None
    )
    process_id = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ
        else None
    )
    if coordinator_address is None and num_processes is None:
        # single-process or auto-discovered TPU pod environment
        if jax.process_count() > 1:
            _INITIALIZED = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True


def is_distributed() -> bool:
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def broadcast_object(obj: Any, source: int = 0) -> Any:
    """Broadcast an arbitrary picklable object from `source` to all
    processes (the analogue of dist.broadcast_object_list,
    ref distributed/utils.py:116-129)."""
    if not is_distributed():
        return obj
    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj) if process_index() == source else b""
    data = np.frombuffer(payload, dtype=np.uint8)
    # lengths first, then the padded payload
    length = multihost_utils.broadcast_one_to_all(
        np.asarray([len(data)], dtype=np.int64), is_source=process_index() == source
    )
    buf = np.zeros(int(length[0]), dtype=np.uint8)
    buf[: len(data)] = data
    out = multihost_utils.broadcast_one_to_all(
        buf, is_source=process_index() == source
    )
    return pickle.loads(out.tobytes())


def wait_for_comms(arrays) -> None:
    """Block until in-flight collective results are ready."""
    for arr in jax.tree_util.tree_leaves(arrays):
        if hasattr(arr, "block_until_ready"):
            arr.block_until_ready()
