"""Work-partitioned parallel compression.

Functional analogue of `distributed/module_parallel.py:23-89`: modules are
greedy-bin-packed across processes by byte size, each owner compresses its
share, and results are recoupled. Where the reference drops non-owned
modules to meta and broadcast-recouples through distributed offload caches,
the TPU version simply exchanges the compressed host arrays via
`broadcast_object` (compression outputs are small relative to inputs) —
each process ends with the full compressed state.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from compressed_tensors_tpu.distributed.assign import greedy_bin_packing
from compressed_tensors_tpu.distributed.utils import (
    broadcast_object,
    is_distributed,
    process_count,
    process_index,
)

__all__ = ["partition_modules", "compress_state_parallel"]


def _state_nbytes(state: Mapping[str, np.ndarray]) -> int:
    return sum(np.asarray(v).nbytes for v in state.values())


def partition_modules(
    module_states: Mapping[str, Mapping],
    num_partitions: int,
) -> tuple[list[list[str]], dict[str, int]]:
    """Greedy bin-pack module names across partitions by byte size
    (ref module_parallel.py:37-44)."""
    names = list(module_states.keys())
    _, bins, owner = greedy_bin_packing(
        names, num_partitions,
        item_weight_fn=lambda n: _state_nbytes(module_states[n]),
    )
    return bins, owner


def compress_state_parallel(
    model_compressor,
    module_states: Mapping[str, Mapping],
    modules: Mapping,
) -> dict:
    """Compress a model's modules with the work partitioned across
    processes. Single-process falls back to sequential compression."""
    if not is_distributed():
        return model_compressor.compress_state(module_states, modules)

    nprocs = process_count()
    rank = process_index()
    _, owner = partition_modules(module_states, nprocs)

    owned = {
        name: state for name, state in module_states.items()
        if owner[name] == rank
    }
    compressed_local = model_compressor.compress_state(owned, modules)
    compressed_local = {
        name: {k: np.asarray(v) for k, v in state.items()}
        for name, state in compressed_local.items()
    }

    # recouple: gather every rank's share (ref broadcast recouple :53-89)
    full: dict = {}
    for src in range(nprocs):
        share = broadcast_object(
            compressed_local if src == rank else None, source=src
        )
        full.update(share)
    return full
