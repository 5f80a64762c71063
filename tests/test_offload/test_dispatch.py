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


# --------------------------------------------------------------------------- #
# Placement-semantics corpus ported from the reference's
# tests/test_offload/test_dispatch.py (:121-233): the same two-decoder
# model expressed as a module-size mapping; assertions are on the plan
# (device indices) instead of torch device attributes.

# Model(): decoder0{linear0, linear1}, decoder1{linear0, linear1}, sizes in
# bytes mirroring the reference's Linear(8, 8) modules
LIN = 8 * 8 * 4
MODEL_SIZES = {
    "decoder0.linear0": LIN,
    "decoder0.linear1": LIN,
    "decoder1.linear0": LIN,
    "decoder1.linear1": LIN,
}
TOTAL = sum(MODEL_SIZES.values())


def test_dispatch_one_device():
    """Everything fits on one device (ref test_dispatch_one_device)."""
    plan = dispatch_plan(MODEL_SIZES, [TOTAL])
    assert set(plan.values()) == {0}


def test_dispatch_two_devices():
    """decoder0 on device 0, decoder1 on device 1
    (ref test_dispatch_two_devices)."""
    plan = dispatch_plan(MODEL_SIZES, [2 * LIN, TOTAL - 2 * LIN])
    assert plan["decoder0.linear0"] == 0
    assert plan["decoder0.linear1"] == 0
    assert plan["decoder1.linear0"] == 1
    assert plan["decoder1.linear1"] == 1


def test_dispatch_no_split():
    """A decoder treated as unsplittable skips a device that only fits one
    linear: everything lands on device 1 (ref test_dispatch_no_split)."""
    sizes = {"decoder0": 2 * LIN, "decoder1": 2 * LIN}  # no-split granularity
    plan = dispatch_plan(sizes, [LIN, TOTAL])
    assert plan == {"decoder0": 1, "decoder1": 1}


def test_dispatch_split():
    """At linear granularity the first linear uses the small device
    (ref test_dispatch_split)."""
    plan = dispatch_plan(MODEL_SIZES, [LIN, TOTAL - LIN])
    assert plan["decoder0.linear0"] == 0
    assert plan["decoder0.linear1"] == 1
    assert plan["decoder1.linear0"] == 1
    assert plan["decoder1.linear1"] == 1


def test_dispatch_offloaded():
    """Not enough device memory: trailing modules offload to host (-1)
    while the head stays on device (ref test_dispatch_offloaded)."""
    sizes = {"decoder0.linear0": LIN, "decoder0.linear1": LIN,
             "decoder1": 2 * LIN}
    plan = dispatch_plan(sizes, [2 * LIN])
    assert plan["decoder0.linear0"] == 0
    # at least one trailing module is host-offloaded; nothing is dropped
    assert set(plan) == set(sizes)
    assert -1 in plan.values()


def test_dispatch_cpu_only_via_fallback():
    """Zero device memory: everything host-offloads rather than raising
    (ref test_dispatch_cpu_only_via_fallback)."""
    plan = dispatch_plan(MODEL_SIZES, [0])
    assert set(plan.values()) == {-1}


def test_dispatch_no_fallback_raises():
    import pytest

    from compressed_tensors_tpu.offload.dispatch import SearchFailureError

    with pytest.raises(SearchFailureError):
        dispatch_plan(MODEL_SIZES, [0], allow_host_offload=False)
