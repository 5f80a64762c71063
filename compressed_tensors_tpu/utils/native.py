"""ctypes bindings for the native host-side IO/codec library (csrc/ct_io.cpp).

Compiled on demand with g++ into a per-user cache; every entry point has a
pure-Python fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

__all__ = [
    "native_available",
    "read_range_parallel",
    "unpack_int32_native",
    "pack_int32_native",
]

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "ct_io.cpp")
_LIB = None
_TRIED = False


def _build_lib() -> str | None:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(),
                             f"ct_tpu_native_{os.getuid()}")
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, f"ct_io_{digest}.so")
    if os.path.exists(lib_path):
        return lib_path
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             "-o", lib_path, src],
            check=True, capture_output=True, timeout=120,
        )
        return lib_path
    except Exception:
        return None


def _get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    from compressed_tensors_tpu.flags import FLAGS

    if FLAGS.disable_native:
        return None
    path = _build_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.ct_read_range_parallel.restype = ctypes.c_int
        lib.ct_read_range_parallel.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.ct_unpack_int32_mt.restype = None
        lib.ct_unpack_int32_mt.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ]
        lib.ct_pack_int32.restype = None
        lib.ct_pack_int32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def read_range_parallel(
    path: str, offset: int, size: int, num_threads: int = 8
) -> np.ndarray | None:
    """Read a byte range of a file with parallel pread workers. Returns the
    bytes as uint8 array, or None if the native library is unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    buf = np.empty(size, dtype=np.uint8)
    rc = lib.ct_read_range_parallel(
        path.encode(), offset, size,
        buf.ctypes.data_as(ctypes.c_void_p), num_threads,
    )
    if rc != 0:
        return None
    return buf


def unpack_int32_native(
    packed: np.ndarray, num_bits: int, cols: int, num_threads: int = 8
) -> np.ndarray | None:
    """Host-side dense int32 -> int8 unpack (codec-identical to
    ops.pack.unpack_from_int32 with packed_dim=1)."""
    lib = _get_lib()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, dtype=np.int32)
    rows, packed_cols = packed.shape
    out = np.empty((rows, cols), dtype=np.int8)
    lib.ct_unpack_int32_mt(
        packed.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        rows, packed_cols, cols, num_bits, num_threads,
    )
    return out


def pack_int32_native(
    values: np.ndarray, num_bits: int
) -> np.ndarray | None:
    """Host-side int8 -> dense int32 pack (codec-identical to
    ops.pack.pack_to_int32 with packed_dim=1)."""
    lib = _get_lib()
    if lib is None:
        return None
    values = np.ascontiguousarray(values, dtype=np.int8)
    rows, cols = values.shape
    packed_cols = (cols * num_bits + 31) // 32
    out = np.empty((rows, packed_cols), dtype=np.int32)
    lib.ct_pack_int32(
        values.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        rows, cols, packed_cols, num_bits,
    )
    return out
