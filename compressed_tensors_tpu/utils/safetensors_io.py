"""Safetensors + checkpoint I/O.

A native reader/writer for the safetensors format (8-byte LE header length,
JSON header, raw little-endian tensor data) with full dtype control — bf16
and fp8 map onto ml_dtypes without a torch dependency, and reads are lazy
zero-copy mmap views. Plays the role of the reference's
`utils/safetensors_load.py` (:81-523): shard resolution, index parsing and
rewriting, config discovery, weight-name -> file mappings, nested qparam
grouping.
"""

from __future__ import annotations

import json
import mmap
import os
import re
import struct
from typing import Iterable, Mapping

import numpy as np

from compressed_tensors_tpu.config import (
    COMPRESSION_VERSION_NAME,
    QUANTIZATION_CONFIG_NAME,
    QUANTIZATION_METHOD,
    QUANTIZATION_METHOD_NAME,
    SPARSITY_CONFIG_NAME,
    TRANSFORM_CONFIG_NAME,
)
from compressed_tensors_tpu.utils.dtypes import SAFETENSORS_DTYPES

__all__ = [
    "SafetensorsFile",
    "load_safetensors",
    "save_safetensors",
    "get_weight_map",
    "get_checkpoint_files",
    "get_safetensors_header",
    "get_nested_weight_mappings",
    "get_quantization_parameter_to_path_mapping",
    "is_quantization_param",
    "get_quantization_config_dict",
    "update_config",
    "update_safetensors_index",
    "CheckpointReader",
]

_DTYPE_TO_ST = {v: k for k, v in SAFETENSORS_DTYPES.items()}
_ST_INDEX_NAME = "model.safetensors.index.json"


class SafetensorsFile:
    """Lazy, mmap-backed safetensors reader."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            header_len = struct.unpack("<Q", f.read(8))[0]
            self.header = json.loads(f.read(header_len))
        self._data_start = 8 + header_len
        self.metadata = self.header.pop("__metadata__", {})
        self._mmap = None

    def keys(self) -> list[str]:
        return list(self.header.keys())

    def _ensure_mmap(self):
        if self._mmap is None:
            f = open(self.path, "rb")
            self._mmap = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        return self._mmap

    # tensors at least this large use the native parallel reader when
    # available (cold-cache loads are IO-latency bound)
    PARALLEL_READ_BYTES = 64 * 1024 * 1024

    def get(self, name: str) -> np.ndarray:
        """Zero-copy view of one tensor (little-endian host layout).

        Large tensors are materialized with the native parallel pread
        library (csrc/ct_io.cpp) when it is available."""
        info = self.header[name]
        dtype = SAFETENSORS_DTYPES[info["dtype"]]
        shape = tuple(info["shape"])
        start, end = info["data_offsets"]

        if end - start >= self.PARALLEL_READ_BYTES:
            from compressed_tensors_tpu.utils.native import (
                read_range_parallel,
            )

            buf = read_range_parallel(
                self.path, self._data_start + start, end - start
            )
            if buf is not None:
                return buf.view(dtype).reshape(shape)

        mm = self._ensure_mmap()
        buf = memoryview(mm)[self._data_start + start : self._data_start + end]
        return np.frombuffer(buf, dtype=dtype).reshape(shape)

    def get_shape(self, name: str) -> tuple[int, ...]:
        return tuple(self.header[name]["shape"])

    def get_dtype(self, name: str) -> np.dtype:
        return SAFETENSORS_DTYPES[self.header[name]["dtype"]]

    def close(self):
        if self._mmap is not None:
            try:
                self._mmap.close()
            except BufferError:
                # zero-copy views still reference the mapping; let GC reclaim
                pass
            self._mmap = None


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    f = SafetensorsFile(path)
    return {k: f.get(k) for k in f.keys()}


def save_safetensors(
    path: str,
    tensors: Mapping[str, np.ndarray],
    metadata: Mapping[str, str] | None = None,
):
    """Write a safetensors file (sorted keys, 8-byte-aligned header)."""
    header: dict = {}
    if metadata:
        header["__metadata__"] = dict(metadata)

    offset = 0
    arrays: list[np.ndarray] = []
    for name in tensors:
        arr = np.ascontiguousarray(np.asarray(tensors[name]))
        st_dtype = _DTYPE_TO_ST.get(arr.dtype)
        if st_dtype is None:
            raise ValueError(f"Cannot serialize dtype {arr.dtype} for {name}")
        nbytes = arr.nbytes
        header[name] = {
            "dtype": st_dtype,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + nbytes],
        }
        arrays.append(arr)
        offset += nbytes

    header_bytes = json.dumps(header, separators=(",", ":")).encode()
    # pad header with spaces to 8-byte alignment (safetensors convention)
    pad = (-(8 + len(header_bytes))) % 8
    header_bytes += b" " * pad

    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(header_bytes)))
        f.write(header_bytes)
        for arr in arrays:
            f.write(arr.tobytes())


def get_checkpoint_files(path: str) -> list[str]:
    """All safetensors shard paths for a local checkpoint directory
    (ref safetensors_load.py:81)."""
    index_path = os.path.join(path, _ST_INDEX_NAME)
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
        return [os.path.join(path, fname) for fname in files]
    single = os.path.join(path, "model.safetensors")
    if os.path.exists(single):
        return [single]
    # any safetensors files present
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".safetensors")
    )


def get_safetensors_header(path: str) -> dict:
    """Header-only read of one safetensors file: tensor name -> {dtype,
    shape, data_offsets}, no tensor data touched (ref
    safetensors_load.py:302)."""
    with open(path, "rb") as f:
        header_len = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(header_len))
    header.pop("__metadata__", None)
    return header


def is_quantization_param(name: str) -> bool:
    """Whether a tensor name is a quantization parameter (ref
    safetensors_load.py:524)."""
    return (
        name.endswith("_scale")
        or name.endswith("zero_point")
        or name.endswith("g_idx")
    )


def get_quantization_parameter_to_path_mapping(path: str) -> dict[str, str]:
    """Full tensor name -> absolute shard path, qparams only (ref
    safetensors_load.py:456)."""
    return {
        name: os.path.join(path, fname)
        for name, fname in get_weight_map(path).items()
        if is_quantization_param(name)
    }


def get_nested_weight_mappings(
    path: str,
    params_to_nest: Iterable[str] | None = None,
    return_unmatched_params: bool = False,
):
    """module name -> {local param name -> absolute shard path} (ref
    safetensors_load.py:387). When ``params_to_nest`` is given, only those
    local names are kept; with ``return_unmatched_params`` the flat
    {full name -> path} map of everything NOT nested is returned too."""
    keep = set(params_to_nest) if params_to_nest is not None else None
    nested: dict[str, dict[str, str]] = {}
    unmatched: dict[str, str] = {}
    for name, fname in get_weight_map(path).items():
        module, param = CheckpointReader.split(name)
        full_path = os.path.join(path, fname)
        if keep is not None and param not in keep:
            unmatched[name] = full_path
            continue
        nested.setdefault(module, {})[param] = full_path
    if return_unmatched_params:
        return nested, unmatched
    return nested


def get_weight_map(path: str) -> dict[str, str]:
    """tensor name -> shard filename (ref safetensors_load.py:204)."""
    index_path = os.path.join(path, _ST_INDEX_NAME)
    if os.path.exists(index_path):
        with open(index_path) as f:
            return json.load(f)["weight_map"]
    weight_map = {}
    for file in get_checkpoint_files(path):
        st = SafetensorsFile(file)
        for key in st.keys():
            weight_map[key] = os.path.basename(file)
        st.close()
    return weight_map


def update_safetensors_index(
    save_directory: str, weight_map: dict[str, str]
) -> None:
    """Write model.safetensors.index.json (ref safetensors_load.py:228)."""
    total_size = 0
    for file in set(weight_map.values()):
        fpath = os.path.join(save_directory, file)
        if os.path.exists(fpath):
            total_size += os.path.getsize(fpath)
    index = {"metadata": {"total_size": total_size}, "weight_map": weight_map}
    with open(os.path.join(save_directory, _ST_INDEX_NAME), "w") as f:
        json.dump(index, f, indent=2, sort_keys=True)


def get_quantization_config_dict(path: str) -> dict | None:
    """Read config.json["quantization_config"] (ref safetensors_load.py:153)."""
    config_path = os.path.join(path, "config.json")
    if not os.path.exists(config_path):
        return None
    with open(config_path) as f:
        config = json.load(f)
    qconfig = config.get(QUANTIZATION_CONFIG_NAME)
    if qconfig is None:
        return None
    if qconfig.get(QUANTIZATION_METHOD_NAME) not in (None, QUANTIZATION_METHOD):
        return None
    return qconfig


def update_config(
    save_directory: str,
    quantization_config=None,
    transform_config=None,
    version: str | None = None,
) -> None:
    """Write quantization/transform configs into config.json
    (ref model_compressor.py:209-244)."""
    from compressed_tensors_tpu.version import __version__

    config_file_path = os.path.join(save_directory, "config.json")
    if os.path.exists(config_file_path):
        with open(config_file_path) as file:
            config_data = json.load(file)
    else:
        config_data = {}

    qconfig_data = (
        quantization_config.model_dump(mode="json", exclude=["quant_method"])
        if quantization_config is not None
        else {}
    )
    tconfig_data = (
        transform_config.model_dump(mode="json")
        if transform_config is not None
        else {}
    )

    config_data[QUANTIZATION_CONFIG_NAME] = {
        COMPRESSION_VERSION_NAME: version or __version__,
        QUANTIZATION_METHOD_NAME: QUANTIZATION_METHOD,
        SPARSITY_CONFIG_NAME: {},
        TRANSFORM_CONFIG_NAME: tconfig_data,
        **qconfig_data,
    }
    with open(config_file_path, "w") as config_file:
        json.dump(config_data, config_file, indent=2, sort_keys=True)


class CheckpointReader:
    """Streaming reader over a sharded checkpoint, grouping tensors into
    per-module local state dicts (the role of get_nested_weight_mappings,
    ref safetensors_load.py:387)."""

    # local param names that belong to a module (quantization vocabulary)
    _QPARAM_RE = re.compile(
        r"^(weight|weight_packed|weight_scale|weight_shape|weight_zero_point|"
        r"weight_g_idx|weight_global_scale|input_scale|input_zero_point|"
        r"input_global_scale|output_scale|output_zero_point|bias|"
        r"k_scale|v_scale|q_scale|"
        r"weight\.(compressed|bitmask|shape|row_offsets))$"
    )

    def __init__(self, path: str):
        self.path = path
        self.weight_map = get_weight_map(path)
        self._files: dict[str, SafetensorsFile] = {}

    def _file_for(self, tensor_name: str) -> SafetensorsFile:
        fname = self.weight_map[tensor_name]
        if fname not in self._files:
            self._files[fname] = SafetensorsFile(os.path.join(self.path, fname))
        return self._files[fname]

    def tensor_names(self) -> list[str]:
        return list(self.weight_map.keys())

    def get(self, name: str) -> np.ndarray:
        return self._file_for(name).get(name)

    def module_names(self) -> list[str]:
        """Distinct module prefixes, in checkpoint order."""
        seen: dict[str, None] = {}
        for name in self.weight_map:
            module, param = self.split(name)
            if module not in seen:
                seen[module] = None
        return list(seen)

    @classmethod
    def split(cls, tensor_name: str) -> tuple[str, str]:
        """Split a full tensor name into (module prefix, local param name),
        handling the dotted sparse suffixes (weight.compressed etc.)."""
        for suffix in ("weight.compressed", "weight.bitmask", "weight.shape",
                       "weight.row_offsets"):
            if tensor_name.endswith("." + suffix):
                return tensor_name[: -len(suffix) - 1], suffix
        module, _, param = tensor_name.rpartition(".")
        return module, param

    def module_state_dict(self, module_name: str) -> dict[str, np.ndarray]:
        """All local tensors of one module."""
        out = {}
        prefix = module_name + "." if module_name else ""
        for name in self.weight_map:
            if not name.startswith(prefix):
                continue
            local = name[len(prefix):]
            if self._QPARAM_RE.match(local):
                out[local] = self.get(name)
        return out

    def close(self):
        for f in self._files.values():
            f.close()
        self._files.clear()
