"""Offload-cache behavioral corpus — the remaining semantics of the
reference's tests/test_offload/cache tree (helpers.py:11-150, test_cpu.py,
test_disk.py) translated to the functional OffloadCache:

- garbage collection of onloaded copies (helpers._test_garbage_collect)
- nested disable_offloading / disable_onloading and their thread-locality
  (the reference shares the flags as class attributes across instances,
  helpers._test_shared_attributes; ours are threading.local so two engine
  threads cannot fight — the invariant tested is the reference's intent:
  one flag governs every cache instance in scope)
- in-place update vs re-offload on shape/dtype mismatch
  (helpers._test_update_offload, cache/base.py:162-175)
- adopted-symlink safety: update breaks the link instead of writing
  through into the checkpoint shard; delete never unlinks the source
  (ref cache/disk.py:153-178)
- save_checkpoint over mixed clean/adopted/dirty entries
- DiskCache._owned refusal to touch foreign paths
"""

import gc
import os
import threading
import weakref

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.offload import (
    DeviceCache,
    DiskCache,
    HostCache,
    disable_offloading,
)
from compressed_tensors_tpu.offload.cache import disable_onloading
from compressed_tensors_tpu.utils.safetensors_io import (
    SafetensorsFile,
    save_safetensors,
)


@pytest.fixture(params=["host", "device", "disk"])
def cache(request, tmp_path):
    if request.param == "host":
        return HostCache()
    if request.param == "device":
        return DeviceCache()
    return DiskCache(str(tmp_path / "offload"))


def _shard(tmp_path, name="model.weight", value=None):
    """Write a one-tensor checkpoint shard and return its path."""
    path = str(tmp_path / "model-00001-of-00001.safetensors")
    if value is None:
        value = np.arange(16, dtype=np.float32).reshape(4, 4)
    save_safetensors(path, {name: value})
    return path, value


# garbage collection ----------------------------------------------------- #


def test_onloaded_copy_garbage_collects(cache):
    """Outside disable_offloading, nothing pins the onloaded array: when
    the caller drops it, it is collectable (helpers._test_garbage_collect).
    DeviceCache is exempt — its stored value IS the device array."""
    cache["w"] = jnp.ones((8,), jnp.float32)
    onloaded = cache["w"]
    if isinstance(cache, DeviceCache):
        return
    r = weakref.ref(onloaded)
    del onloaded
    gc.collect()
    assert r() is None


def test_disable_offloading_pins_then_releases(cache):
    """Inside the context the cached copy is pinned by the cache; evict()
    after the context releases it (helpers._test_disable_offloading)."""
    if isinstance(cache, DeviceCache):
        return
    cache["w"] = jnp.ones((8,), jnp.float32)
    with disable_offloading():
        inside = cache["w"]
        r = weakref.ref(inside)
        del inside
        gc.collect()
        assert r() is not None, "cache must pin the copy inside the context"
    cache.evict()
    gc.collect()
    assert r() is None


# nested / thread-local disable contexts --------------------------------- #


def test_disable_offloading_nests(cache):
    cache["w"] = jnp.ones((4,), jnp.float32)
    with disable_offloading():
        a = cache["w"]
        with disable_offloading():
            assert cache["w"] is a
        # inner exit restores the *outer* state, not "enabled"
        assert cache["w"] is a


def test_disable_onloading_nests(tmp_path):
    disk = DiskCache(str(tmp_path / "off"))
    disk["w"] = jnp.ones((4,), jnp.float32)
    with disable_onloading():
        with disable_onloading():
            assert isinstance(disk["w"], str)
        assert isinstance(disk["w"], str)
    assert isinstance(disk["w"], jax.Array)


def test_disable_flags_are_thread_local():
    """Two threads do not share the disable state: a worker that reads
    while the main thread holds disable_onloading still gets onloaded
    arrays (TPU translation of helpers._test_shared_attributes — the
    reference scopes the flag per-class, we scope per-thread so the
    serving engine's IO thread can't flip execution-path reads)."""
    host = HostCache()
    host["w"] = jnp.ones((4,), jnp.float32)
    results = {}

    def worker():
        results["worker"] = host["w"]

    with disable_onloading():
        t = threading.Thread(target=worker)
        t.start()
        t.join()
        results["main"] = host["w"]

    assert isinstance(results["main"], np.ndarray)  # raw host buffer
    assert isinstance(results["worker"], jax.Array)  # unaffected thread


def test_one_flag_governs_all_instances():
    """The reference's intent for shared class attributes: a single
    disable_offloading context governs every cache in scope."""
    a, b = HostCache(), HostCache()
    a["w"] = jnp.ones((2,), jnp.float32)
    b["w"] = jnp.ones((2,), jnp.float32)
    with disable_offloading():
        assert a["w"] is a["w"]
        assert b["w"] is b["w"]


# update semantics ------------------------------------------------------- #


def test_update_in_place_when_shape_matches(cache):
    """Matching shape+dtype updates the offloaded buffer in place where a
    buffer exists (cache/base.py:162-175): HostCache keeps the same numpy
    array object; DiskCache keeps the same path."""
    a = np.ones((4, 4), np.float32)
    cache["w"] = jnp.asarray(a)
    if isinstance(cache, HostCache):
        stored_before = cache._store["w"]
    elif isinstance(cache, DiskCache):
        stored_before = cache._store["w"]
    cache["w"] = jnp.asarray(a * 3)
    np.testing.assert_array_equal(np.asarray(cache["w"]), a * 3)
    if isinstance(cache, (HostCache, DiskCache)):
        assert cache._store["w"] is stored_before or (
            cache._store["w"] == stored_before
        )


def test_update_reoffloads_on_shape_mismatch(cache):
    cache["w"] = jnp.ones((4, 4), jnp.float32)
    cache["w"] = jnp.zeros((2, 8), jnp.float32)
    out = np.asarray(cache["w"])
    assert out.shape == (2, 8)
    np.testing.assert_array_equal(out, 0)


def test_update_reoffloads_on_dtype_mismatch():
    host = HostCache()
    host["w"] = jnp.ones((4,), jnp.float32)
    host["w"] = jnp.ones((4,), jnp.int32)
    assert np.asarray(host["w"]).dtype == np.int32


# adopted-symlink safety (zero-copy interop) ----------------------------- #


def test_adopt_reads_checkpoint_without_copy(tmp_path):
    shard, value = _shard(tmp_path)
    disk = DiskCache(str(tmp_path / "off"))
    disk.adopt("model.weight", shard, "model.weight")
    assert disk.is_adopted("model.weight")
    np.testing.assert_array_equal(np.asarray(disk["model.weight"]), value)
    # no tensor bytes were copied: the cache entry is a link to the shard
    link = disk._store["model.weight"]
    assert os.path.islink(link)
    assert os.path.samefile(link, shard)


def test_update_never_writes_through_adopted_link(tmp_path):
    """The first write to an adopted entry must break the link — the
    source checkpoint shard's bytes are sacrosanct (ref disk.py:153-178)."""
    shard, value = _shard(tmp_path)
    before = open(shard, "rb").read()
    disk = DiskCache(str(tmp_path / "off"))
    disk.adopt("model.weight", shard, "model.weight")
    disk["model.weight"] = jnp.asarray(value * 7)
    assert open(shard, "rb").read() == before, "source shard was modified"
    assert not disk.is_adopted("model.weight")
    np.testing.assert_array_equal(
        np.asarray(disk["model.weight"]), value * 7
    )


def test_delete_adopted_keeps_source_shard(tmp_path):
    shard, _ = _shard(tmp_path)
    disk = DiskCache(str(tmp_path / "off"))
    disk.adopt("model.weight", shard, "model.weight")
    del disk["model.weight"]
    assert os.path.exists(shard), "deleting the cache entry nuked the shard"


def test_readopt_replaces_previous_entry(tmp_path):
    shard, value = _shard(tmp_path)
    disk = DiskCache(str(tmp_path / "off"))
    disk["model.weight"] = jnp.zeros((4, 4), jnp.float32)
    disk.adopt("model.weight", shard, "model.weight")
    np.testing.assert_array_equal(np.asarray(disk["model.weight"]), value)
    assert len(disk) == 1


def test_save_checkpoint_mixed_clean_dirty(tmp_path):
    """Clean adopted entries are symlinked inode-equal to the shard;
    dirty/native entries are real files with the updated bytes."""
    shard, value = _shard(tmp_path)
    disk = DiskCache(str(tmp_path / "off"))
    disk.adopt("clean", shard, "model.weight")
    disk.adopt("dirty", shard, "model.weight")
    disk["dirty"] = jnp.asarray(value + 1)
    disk["native"] = jnp.asarray(value * 2)

    out = disk.save_checkpoint(str(tmp_path / "save"))
    assert set(out) == {"clean", "dirty", "native"}

    # clean: zero-copy — same inode as the source shard
    assert os.path.islink(out["clean"])
    assert os.path.samefile(out["clean"], shard)
    # dirty + native: owned bytes
    for name, expect in (("dirty", value + 1), ("native", value * 2)):
        assert not os.path.islink(out[name])
        f = SafetensorsFile(out[name])
        try:
            np.testing.assert_array_equal(f.get("tensor"), expect)
        finally:
            f.close()


def test_owned_refuses_foreign_paths(tmp_path):
    """update_offload asserts the target lives in the cache directory —
    a corrupted store can never overwrite arbitrary files."""
    disk = DiskCache(str(tmp_path / "off"))
    foreign = str(tmp_path / "foreign.safetensors")
    save_safetensors(foreign, {"tensor": np.zeros((2,), np.float32)})
    disk._store["w"] = foreign  # simulate corruption
    with pytest.raises(AssertionError, match="refusing"):
        disk["w"] = jnp.ones((2,), jnp.float32)


def test_disk_counter_never_reuses_paths(tmp_path):
    disk = DiskCache(str(tmp_path / "off"))
    disk["a"] = jnp.ones((2,), jnp.float32)
    path_a = disk._store["a"]
    del disk["a"]
    disk["b"] = jnp.ones((2,), jnp.float32)
    assert disk._store["b"] != path_a
