"""Memory-aware placement planning.

Functional analogue of `offload/dispatch.py:142-233` + the binary-search
helper (`offload/utils/binary_search.py:17-41`): given per-module byte
sizes and per-device memory budgets, find a greedy device assignment that
fits, maximizing headroom via binary search over the per-device reserve.
Falls back to host-offload for the overflow (modules assigned device -1).

On TPU this is the planner behind streaming load of models larger than one
chip's HBM (and the single-chip analogue of accelerate's dispatch).
"""

from __future__ import annotations

from typing import Callable, Mapping, TypeVar

__all__ = [
    "max_binary_search",
    "SearchFailureError",
    "dispatch_plan",
    "get_device_map",
    "dispatch_with_map",
]

T = TypeVar("T")


class SearchFailureError(ValueError):
    pass


def max_binary_search(
    fn: Callable[[int], T],
    cond: Callable[[T], bool],
    start: int,
    end: int,
) -> tuple[int, T]:
    """Largest idx in [start, end] where cond(fn(idx)) holds
    (ref binary_search.py:17-41)."""
    best_idx = None
    best_val = None
    while start <= end:
        mid = (start + end) // 2
        val = fn(mid)
        if cond(val):
            best_idx, best_val = mid, val
            start = mid + 1
        else:
            end = mid - 1
    if best_idx is None:
        raise SearchFailureError()
    return best_idx, best_val


def _greedy_dispatch(
    module_sizes: Mapping[str, int],
    device_memory: list[int],
    reserve: int,
) -> dict[str, int] | None:
    """Sequential greedy fill: modules stay in order (locality), moving to
    the next device when the current one is full (ref dispatch.py:42-141
    semantics). Returns None if modules do not fit."""
    assignment: dict[str, int] = {}
    device = 0
    used = 0
    for name, size in module_sizes.items():
        while device < len(device_memory) and \
                used + size > device_memory[device] - reserve:
            device += 1
            used = 0
        if device >= len(device_memory):
            return None
        assignment[name] = device
        used += size
    return assignment


def dispatch_plan(
    module_sizes: Mapping[str, int],
    device_memory: list[int],
    allow_host_offload: bool = True,
) -> dict[str, int]:
    """Plan module -> device placement.

    Binary-searches the largest per-device reserve ("extra memory" for
    activations, ref dispatch.py:195-203) such that a greedy dispatch still
    fits. If nothing fits even with zero reserve, offloads trailing modules
    to host (device -1) until the rest fits (ref dispatch.py:205-233).

    :return: module name -> device index (-1 = host-offloaded)
    """
    if not module_sizes:
        return {}

    try:
        max_reserve = min(device_memory)
        _, assignment = max_binary_search(
            fn=lambda reserve: _greedy_dispatch(
                module_sizes, device_memory, reserve
            ),
            cond=lambda a: a is not None,
            start=0,
            end=max_reserve,
        )
        return assignment
    except SearchFailureError:
        if not allow_host_offload:
            raise

    # pop modules (largest-last order of appearance) to host until fit
    names = list(module_sizes.keys())
    offloaded: set[str] = set()
    for cut in range(len(names) - 1, -1, -1):
        kept = {n: module_sizes[n] for n in names[: cut]}
        assignment = _greedy_dispatch(kept, device_memory, 0)
        if assignment is not None:
            offloaded = set(names[cut:])
            break
    else:
        assignment = {}
        offloaded = set(names)

    for name in offloaded:
        assignment[name] = -1
    return assignment


def get_device_map(
    module_sizes: Mapping[str, int],
    devices: list | None = None,
    memory_fraction: float = 0.9,
) -> dict[str, int]:
    """Plan placement against the live jax devices' memory budgets (ref
    dispatch.py:42-141 `get_device_map`). Devices without memory stats
    (CPU backends) are treated as unbounded."""
    import jax

    devices = devices if devices is not None else jax.devices()
    budgets = []
    for d in devices:
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:  # CPU/interpret backends expose no stats
            pass
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use", 0)
        if limit is None:
            budgets.append(1 << 62)
        else:
            budgets.append(max(0, int(limit * memory_fraction) - in_use))
    return dispatch_plan(module_sizes, budgets)


def dispatch_with_map(
    module_params: Mapping[str, dict],
    device_map: Mapping[str, int],
    devices: list | None = None,
):
    """Place per-module param dicts onto devices per a plan (ref
    dispatch.py:79 `dispatch_with_map`). Modules mapped to -1 stay on host
    (numpy arrays, the functional stand-in for a CPU OffloadCache); the
    rest are `jax.device_put` onto their assigned device.

    :param module_params: module name -> pytree of arrays
    :param device_map: module name -> device index (-1 = host)
    :return: new {module: pytree} with placed leaves
    """
    import jax
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    missing = [n for n in module_params if n not in device_map]
    if missing:
        # a typo'd or stale plan must not silently change placement (the
        # reference requires an explicit assignment per module)
        raise KeyError(
            f"device_map has no entry for module(s) {missing[:5]}"
            + ("..." if len(missing) > 5 else "")
        )
    out = {}
    for name, params in module_params.items():
        dev = device_map[name]
        if dev == -1:
            out[name] = jax.tree.map(np.asarray, params)
        else:
            out[name] = jax.device_put(params, devices[dev])
    return out
