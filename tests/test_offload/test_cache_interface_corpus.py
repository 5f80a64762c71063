"""Offload-cache interface corpus, ported from the reference's
tests/test_offload/{test_interface,test_module}.py over the functional
OffloadCache MutableMapping: onload/offload semantics, disable_offloading
caching, in-place updates, deletion, iteration, and disk-cache file
lifecycle."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.offload import (
    DeviceCache,
    DiskCache,
    HostCache,
    OffloadCache,
    disable_offloading,
)


@pytest.fixture(params=["host", "device", "disk"])
def cache(request, tmp_path):
    if request.param == "host":
        return HostCache()
    if request.param == "device":
        return DeviceCache()
    return DiskCache(str(tmp_path / "offload"))


def test_onloading(cache, rng):
    """__getitem__ onloads to a jax array on the onload device
    (ref test_module.py::test_onloading)."""
    w = rng.standard_normal((4, 4)).astype(np.float32)
    cache["weight"] = jnp.asarray(w)
    out = cache["weight"]
    assert isinstance(out, jax.Array)
    np.testing.assert_array_equal(np.asarray(out), w)


def test_set_item_updates_in_place(cache, rng):
    """Re-setting a key with a matching shape updates the offloaded value
    (ref test_module.py::test_set_item)."""
    a = rng.standard_normal((4, 4)).astype(np.float32)
    b = rng.standard_normal((4, 4)).astype(np.float32)
    cache["weight"] = jnp.asarray(a)
    cache["weight"] = jnp.asarray(b)
    np.testing.assert_array_equal(np.asarray(cache["weight"]), b)


def test_delete(cache, rng):
    """__delitem__ removes the entry (ref test_module.py::test_delete)."""
    cache["weight"] = jnp.asarray(rng.standard_normal((2, 2)).astype(
        np.float32))
    del cache["weight"]
    assert "weight" not in cache
    assert len(cache) == 0


def test_iteration(cache, rng):
    cache["a"] = jnp.asarray(rng.standard_normal((2,)).astype(np.float32))
    cache["b"] = jnp.asarray(rng.standard_normal((2,)).astype(np.float32))
    assert sorted(cache) == ["a", "b"]
    assert len(cache) == 2


def test_disable_offloading_caches_onload(cache, rng):
    """Inside disable_offloading the first onload is cached and reused;
    leaving the context evicts (ref test_interface.py::
    test_disable_offloading, cache/base.py:254-289)."""
    w = rng.standard_normal((4, 4)).astype(np.float32)
    cache["weight"] = jnp.asarray(w)
    with disable_offloading():
        first = cache["weight"]
        second = cache["weight"]
        assert first is second  # onloaded copy reused
    cache.evict()
    third = cache["weight"]
    if not isinstance(cache, DeviceCache):
        # host/disk re-onload a fresh array; DeviceCache stays resident
        assert third is not first
    np.testing.assert_array_equal(np.asarray(third), w)


def test_write_invalidates_onloaded_copy(cache, rng):
    """Setting a key drops its cached onloaded copy
    (ref test_module.py::test_register_parameter_invalidates)."""
    a = rng.standard_normal((2, 2)).astype(np.float32)
    b = rng.standard_normal((2, 2)).astype(np.float32)
    cache["w"] = jnp.asarray(a)
    with disable_offloading():
        _ = cache["w"]
        cache["w"] = jnp.asarray(b)
        np.testing.assert_array_equal(np.asarray(cache["w"]), b)


def test_host_cache_offloaded_repr_is_numpy(rng):
    """HostCache stores host arrays (the functional CPU OffloadCache)."""
    cache = HostCache()
    cache["w"] = jnp.asarray(rng.standard_normal((2, 2)).astype(np.float32))
    assert isinstance(cache._store["w"], np.ndarray)


def test_disk_cache_files_lifecycle(tmp_path, rng):
    """DiskCache writes per-tensor files and removes them on delete
    (ref cache/disk.py delete removes CT-created files)."""
    cache = DiskCache(str(tmp_path / "offload"))
    w = rng.standard_normal((4, 4)).astype(np.float32)
    cache["weight"] = jnp.asarray(w)
    files = os.listdir(tmp_path / "offload")
    assert files, "disk cache wrote no files"
    np.testing.assert_array_equal(np.asarray(cache["weight"]), w)
    del cache["weight"]
    assert not os.listdir(tmp_path / "offload")


def test_missing_key_raises(cache):
    with pytest.raises(KeyError):
        cache["nope"]


def test_disable_onloading_returns_raw(tmp_path, rng):
    """disable_onloading reads give the offloaded representation itself
    (ref cache/base.py disable_onloading): a numpy buffer for HostCache,
    the file path for DiskCache."""
    from compressed_tensors_tpu.offload.cache import (
        DiskCache,
        HostCache,
        disable_onloading,
    )

    w = rng.standard_normal((4, 4)).astype(np.float32)

    host = HostCache()
    host["w"] = jnp.asarray(w)
    with disable_onloading():
        raw = host["w"]
    assert isinstance(raw, np.ndarray)
    np.testing.assert_array_equal(raw, w)

    disk = DiskCache(str(tmp_path / "off"))
    disk["w"] = jnp.asarray(w)
    with disable_onloading():
        raw = disk["w"]
    assert isinstance(raw, str) and os.path.exists(raw)
    # normal reads resume onloading after the context
    np.testing.assert_array_equal(np.asarray(disk["w"]), w)
