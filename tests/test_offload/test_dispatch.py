"""Placement planning (ref offload/dispatch.py:42-233,
offload/utils/binary_search.py:17-41)."""

import jax
import numpy as np
import pytest

from compressed_tensors_tpu.offload.dispatch import (
    SearchFailureError,
    dispatch_plan,
    dispatch_with_map,
    get_device_map,
    max_binary_search,
)


def test_max_binary_search():
    idx, val = max_binary_search(lambda i: i * 2, lambda v: v <= 10, 0, 100)
    assert idx == 5 and val == 10
    with pytest.raises(SearchFailureError):
        max_binary_search(lambda i: i, lambda v: v < 0, 0, 10)


def test_dispatch_plan_fits_with_headroom():
    sizes = {"a": 4, "b": 4, "c": 4}
    plan = dispatch_plan(sizes, [16, 16])
    # binary search maximizes the reserve -> modules spread over both devices
    assert set(plan.values()) <= {0, 1}
    assert plan["a"] == 0


def test_dispatch_plan_host_fallback():
    sizes = {"a": 10, "b": 10, "c": 10}
    plan = dispatch_plan(sizes, [12, 12])
    assert plan["c"] == -1  # trailing module offloaded to host
    assert plan["a"] != -1 and plan["b"] != -1


def test_get_device_map_and_dispatch_with_map():
    devices = jax.devices()
    sizes = {"m.a": 128, "m.b": 128}
    plan = get_device_map(sizes, devices=devices)
    assert set(plan) == {"m.a", "m.b"}

    params = {
        "m.a": {"weight": np.ones((2, 2), np.float32)},
        "m.b": {"weight": np.zeros((2, 2), np.float32)},
    }
    placed = dispatch_with_map(params, plan, devices=devices)
    leaf = placed["m.a"]["weight"]
    assert isinstance(leaf, jax.Array)

    host = dispatch_with_map(params, {"m.a": -1, "m.b": -1})
    assert isinstance(host["m.a"]["weight"], np.ndarray)
