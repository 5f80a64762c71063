"""Offload caches: the memory-hierarchy layer.

TPU-native re-design of `offload/cache/` (ref cache/base.py:48-289): the
reference intercepts torch `_parameters` dicts with onload-on-getitem /
offload-on-setitem MutableMappings backed by cpu/disk/device (+distributed
variants). Here the same onload/offload/update contract manages numpy host
buffers / disk safetensors / jax device arrays for parameter pytrees that
exceed HBM — used by the streaming loader and the PTQ path for models larger
than one chip.

The distributed variants collapse away by design: under GSPMD each process
holds only its shard (see `offload/load.py`), which subsumes
DistributedCPUCache's one-copy-per-node sharing and DistributedDeviceCache's
replication (ref SURVEY §2.9/§2.10 translation note).
"""

from __future__ import annotations

import contextlib
import os
import threading
from collections.abc import MutableMapping
from typing import Iterator

import jax
import numpy as np

__all__ = [
    "OffloadCache",
    "HostCache",
    "DeviceCache",
    "DiskCache",
    "disable_offloading",
    "disable_onloading",
]

_DISABLE_OFFLOADING = threading.local()
_DISABLE_ONLOADING = threading.local()


@contextlib.contextmanager
def disable_offloading():
    """Keep values onloaded for the duration of the context (the analogue of
    ref cache/base.py:254-289)."""
    prev = getattr(_DISABLE_OFFLOADING, "value", False)
    _DISABLE_OFFLOADING.value = True
    try:
        yield
    finally:
        _DISABLE_OFFLOADING.value = prev


@contextlib.contextmanager
def disable_onloading():
    """Raw access: reads return the offloaded representation itself (host
    array / file path / device array) without onloading — the analogue of
    ref cache/base.py's disable_onloading, used by save paths that want
    the stored bytes, not a device copy."""
    prev = getattr(_DISABLE_ONLOADING, "value", False)
    _DISABLE_ONLOADING.value = True
    try:
        yield
    finally:
        _DISABLE_ONLOADING.value = prev


class OffloadCache(MutableMapping):
    """name -> tensor mapping that offloads on write and onloads on read."""

    def __init__(self, onload_device=None):
        self._store: dict[str, object] = {}
        self._onloaded: dict[str, jax.Array] = {}
        self.onload_device = onload_device or jax.devices()[0]

    # subclass interface ------------------------------------------------- #
    def offload(self, value) -> object:
        raise NotImplementedError

    def onload(self, stored) -> jax.Array:
        raise NotImplementedError

    def update_offload(self, name: str, stored, value) -> object:
        """In-place update when shapes/dtypes match; default re-offloads."""
        return self.offload(value)

    # MutableMapping ----------------------------------------------------- #
    def __setitem__(self, name: str, value) -> None:
        if name in self._store:
            self._store[name] = self.update_offload(
                name, self._store[name], value
            )
        else:
            self._store[name] = self.offload(value)
        self._onloaded.pop(name, None)

    def __getitem__(self, name: str) -> jax.Array:
        if getattr(_DISABLE_ONLOADING, "value", False):
            return self._store[name]
        if name in self._onloaded:
            return self._onloaded[name]
        value = self.onload(self._store[name])
        if getattr(_DISABLE_OFFLOADING, "value", False):
            self._onloaded[name] = value
        return value

    def __delitem__(self, name: str) -> None:
        self._store.pop(name)
        self._onloaded.pop(name, None)

    def __iter__(self) -> Iterator[str]:
        return iter(self._store)

    def __len__(self) -> int:
        return len(self._store)

    def evict(self) -> None:
        """Drop any onloaded copies."""
        self._onloaded.clear()


class HostCache(OffloadCache):
    """Offloaded representation lives in host RAM (ref cache/cpu.py)."""

    def offload(self, value) -> np.ndarray:
        # copy into a writable host buffer (device arrays view as read-only)
        return np.array(value)

    def onload(self, stored) -> jax.Array:
        return jax.device_put(stored, self.onload_device)

    def update_offload(self, name, stored, value):
        arr = np.asarray(value)
        if stored.shape == arr.shape and stored.dtype == arr.dtype:
            stored[...] = arr
            return stored
        return arr


class DeviceCache(OffloadCache):
    """Values stay resident on the accelerator (ref cache/device.py)."""

    def offload(self, value) -> jax.Array:
        return jax.device_put(value, self.onload_device)

    def onload(self, stored) -> jax.Array:
        return stored


class DiskCache(OffloadCache):
    """Offloaded representation is a safetensors file per tensor
    (ref cache/disk.py:60-178).

    Zero-copy checkpoint interop (ref cache/disk.py:153-178): a tensor that
    comes straight from a checkpoint shard can be `adopt`ed — its offloaded
    representation is then a *symlink* to the shard, no bytes are copied.
    The first `update` of an adopted tensor breaks the link and writes a
    cache-owned file; `save_checkpoint` symlinks still-clean adopted tensors
    into the destination instead of rewriting their bytes.
    """

    def __init__(self, directory: str, onload_device=None):
        super().__init__(onload_device)
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self._counter = 0
        # path -> safetensors tensor name (adopted entries keep the
        # checkpoint's name; cache-written files use "tensor")
        self._tensor_name: dict[str, str] = {}

    def _path(self, suffix: int) -> str:
        return os.path.join(self.directory, f"tensor_{suffix}.safetensors")

    def _owned(self, path: str) -> bool:
        """Only ever delete/overwrite files this cache created."""
        return os.path.dirname(os.path.abspath(path)) == os.path.abspath(
            self.directory
        )

    def offload(self, value) -> str:
        from compressed_tensors_tpu.utils.safetensors_io import save_safetensors

        path = self._path(self._counter)
        self._counter += 1
        save_safetensors(path, {"tensor": np.asarray(value)})
        return path

    def onload(self, stored: str) -> jax.Array:
        from compressed_tensors_tpu.utils.safetensors_io import SafetensorsFile

        f = SafetensorsFile(stored)
        try:
            tensor_name = self._tensor_name.get(stored, "tensor")
            return jax.device_put(f.get(tensor_name), self.onload_device)
        finally:
            f.close()

    def update_offload(self, name, stored: str, value):
        from compressed_tensors_tpu.utils.safetensors_io import save_safetensors

        assert self._owned(stored), f"refusing to write to {stored}"
        if os.path.islink(stored):
            # adopted checkpoint tensor: break the link, never write
            # through it into the source shard
            os.unlink(stored)
            self._tensor_name.pop(stored, None)
        save_safetensors(stored, {"tensor": np.asarray(value)})
        return stored

    def __delitem__(self, name: str) -> None:
        path = self._store.get(name)
        super().__delitem__(name)
        if path:
            self._tensor_name.pop(path, None)
            if self._owned(path) and os.path.lexists(path):
                os.remove(path)

    # zero-copy checkpoint interop -------------------------------------- #
    def adopt(self, name: str, source_path: str, tensor_name: str) -> None:
        """Register `tensor_name` inside the checkpoint shard `source_path`
        as this entry's offloaded representation without copying bytes:
        the cache entry is a symlink to the shard."""
        if name in self._store:
            del self[name]
        link = self._path(self._counter)
        self._counter += 1
        os.symlink(os.path.abspath(source_path), link)
        self._store[name] = link
        self._tensor_name[link] = tensor_name
        self._onloaded.pop(name, None)

    def is_adopted(self, name: str) -> bool:
        """True while the entry is still an unmodified checkpoint symlink."""
        path = self._store.get(name)
        return path is not None and os.path.islink(path)

    def save_checkpoint(self, out_dir: str) -> dict[str, str]:
        """Write every entry under `out_dir/<name>.safetensors`. Entries
        still backed by an unmodified checkpoint symlink are symlinked —
        their shard bytes are never re-read or re-written (inode-equal to
        the source); modified/native entries are written normally.

        :return: name -> file path map
        """
        import shutil

        os.makedirs(out_dir, exist_ok=True)
        out: dict[str, str] = {}
        for name, path in self._store.items():
            dest = os.path.join(out_dir, f"{name}.safetensors")
            if os.path.lexists(dest):
                os.remove(dest)
            if os.path.islink(path):
                os.symlink(os.path.realpath(path), dest)
            else:
                shutil.copyfile(path, dest)
            out[name] = dest
        return out
