"""Zero-copy disk-offload checkpoint interop.

The reference's DiskCache symlinks checkpoint shards instead of copying
bytes and only breaks the link on the first update
(ref offload/cache/disk.py:143-178). These tests pin the TPU framework's
analogue: adopt() is byte-free, update breaks the link without touching
the source shard, and save_checkpoint() links untouched tensors
(inode-equal) instead of rewriting them.
"""

import os

import numpy as np
import pytest

from compressed_tensors_tpu.offload.cache import DiskCache
from compressed_tensors_tpu.utils.safetensors_io import (
    SafetensorsFile,
    save_safetensors,
)


@pytest.fixture
def shard(tmp_path):
    """A fake checkpoint shard holding two tensors."""
    path = str(tmp_path / "model-00001-of-00001.safetensors")
    rng = np.random.default_rng(0)
    tensors = {
        "model.layers.0.weight": rng.standard_normal((8, 8)).astype(
            np.float32
        ),
        "model.layers.1.weight": rng.standard_normal((4, 4)).astype(
            np.float32
        ),
    }
    save_safetensors(path, tensors)
    return path, tensors


def test_adopt_is_byte_free(tmp_path, shard):
    source, tensors = shard
    cache = DiskCache(str(tmp_path / "offload"))
    cache.adopt("w0", source, "model.layers.0.weight")

    # the offloaded representation is a symlink, not a copy
    stored = cache._store["w0"]
    assert os.path.islink(stored)
    assert os.path.samefile(stored, source)
    assert cache.is_adopted("w0")

    # onload reads the checkpoint's tensor through the link
    np.testing.assert_array_equal(
        np.asarray(cache["w0"]), tensors["model.layers.0.weight"]
    )


def test_update_breaks_link_and_preserves_source(tmp_path, shard):
    source, tensors = shard
    src_bytes = open(source, "rb").read()
    cache = DiskCache(str(tmp_path / "offload"))
    cache.adopt("w0", source, "model.layers.0.weight")

    new = np.ones((8, 8), dtype=np.float32)
    cache["w0"] = new

    assert not cache.is_adopted("w0")
    stored = cache._store["w0"]
    assert not os.path.islink(stored)
    np.testing.assert_array_equal(np.asarray(cache["w0"]), new)
    # the source shard's bytes are untouched
    assert open(source, "rb").read() == src_bytes


def test_save_checkpoint_links_untouched_shards(tmp_path, shard):
    source, tensors = shard
    cache = DiskCache(str(tmp_path / "offload"))
    cache.adopt("w0", source, "model.layers.0.weight")
    cache.adopt("w1", source, "model.layers.1.weight")
    # w1 is modified, w0 stays clean
    w1_new = np.full((4, 4), 7.0, dtype=np.float32)
    cache["w1"] = w1_new

    out = cache.save_checkpoint(str(tmp_path / "save"))

    # untouched tensor: a link, inode-equal to the source shard
    assert os.path.islink(out["w0"])
    assert os.stat(out["w0"]).st_ino == os.stat(source).st_ino
    # modified tensor: real bytes, different inode
    assert not os.path.islink(out["w1"])
    assert os.stat(out["w1"]).st_ino != os.stat(source).st_ino
    f = SafetensorsFile(out["w1"])
    try:
        np.testing.assert_array_equal(np.asarray(f.get("tensor")), w1_new)
    finally:
        f.close()


def test_delete_adopted_removes_only_the_link(tmp_path, shard):
    source, _ = shard
    cache = DiskCache(str(tmp_path / "offload"))
    cache.adopt("w0", source, "model.layers.0.weight")
    del cache["w0"]
    assert os.path.exists(source)  # the shard survives
    assert not os.listdir(tmp_path / "offload")
