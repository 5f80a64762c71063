"""Checkpoint converters: streaming, model-free rewrites of safetensors
tensors into (or out of) the compressed-tensors format.

Mirrors `entrypoints/convert/converters/` — the Converter protocol
(base.py:19-73), inverse weight maps (base.py:76-144), AutoAWQ GEMM nibble
unpacking (autoawq.py:27-262), the CT dequantizer (ct_dequantizer.py),
ModelOpt NVFP4 renames/inversions (modelopt_nvfp4.py) and the DeepSeek-style
FP8-block dequantizer (fp8block_dequantizer.py).
"""

from __future__ import annotations

import os
import re
from collections import defaultdict
from typing import Dict, Iterable, Protocol

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from compressed_tensors_tpu.compressors import BaseCompressor, infer_module_format
from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.ops.pack import pack_to_int32
from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationConfig,
    QuantizationScheme,
    QuantizationStatus,
    QuantizationStrategy,
    QuantizationType,
)
from compressed_tensors_tpu.quantization.quant_scheme import NVFP4
from compressed_tensors_tpu.utils.match import (
    match_name,
    match_quantizable_tensors,
)

__all__ = [
    "Converter",
    "build_inverse_weight_maps",
    "AutoAWQConverter",
    "CompressedTensorsDequantizer",
    "ModelOptNvfp4Converter",
    "FP8BlockDequantizer",
]

TensorDict = Dict[str, np.ndarray]


class Converter(Protocol):
    """Converter interface (ref converters/base.py:19-73)."""

    def process(self, tensors: TensorDict) -> TensorDict:
        raise NotImplementedError()

    def validate(self, tensors: TensorDict) -> None:
        raise NotImplementedError()

    def create_config(self) -> QuantizationConfig | None:
        raise NotImplementedError()

    def get_dependencies(self, weight_name: str) -> set[str]:
        raise NotImplementedError()


def build_inverse_weight_maps(
    weight_map: dict[str, str],
    model_files: dict[str, str],
    converters: list[Converter],
) -> dict[str, dict[str, list[str]]]:
    """Per output shard: which tensors to read from which source files,
    including cross-shard dependencies (ref converters/base.py:76-144)."""

    def deps_recursive(weight_name: str, current: set[str]) -> set[str]:
        for converter in converters:
            for dep in converter.get_dependencies(weight_name):
                if dep not in current:
                    current.add(dep)
                    deps_recursive(dep, current)
        return current

    weight_deps = {
        name: deps_recursive(name, set()) for name in weight_map
    }
    for name, deps in weight_deps.items():
        assert name not in deps, f"{name} found in its own dependencies"

    all_dependencies: set[str] = set().union(*weight_deps.values()) \
        if weight_deps else set()

    inverse: dict[str, dict[str, list[str]]] = defaultdict(
        lambda: defaultdict(list)
    )
    for name, shard in weight_map.items():
        if name in all_dependencies:
            continue  # partner tensor of another primary; loaded with it
        iwm = inverse[shard]
        for add_name in [name, *weight_deps[name]]:
            if add_name not in weight_map:
                raise ValueError(
                    f"Dependency weight {add_name} not found in weight map"
                )
            resolved = model_files[weight_map[add_name]]
            iwm[resolved].append(add_name)

    return {k: dict(v) for k, v in inverse.items()}


# --------------------------------------------------------------------------- #
# AutoAWQ


class AutoAWQConverter:
    """AutoAWQ GEMM (qweight/qzeros/scales) -> CT pack-quantized W4A16-asym.

    AWQ packs 8 nibbles per int32 in the order [0, 4, 1, 5, 2, 6, 3, 7]
    along dim 1, with weights transposed relative to CT; the conversion
    unpacks, un-reorders, offsets to signed, transposes and repacks
    (ref autoawq.py:103-262).
    """

    AWQ_REVERSE_ORDER = [0, 4, 1, 5, 2, 6, 3, 7]

    def __init__(
        self,
        bits: int = 4,
        group_size: int = 128,
        zero_point: bool = True,
        version: str = "gemm",
        ignore: Iterable[str] = ("lm_head",),
        targets: Iterable[str] = ("Linear",),
    ):
        if bits != 4:
            raise ValueError(
                "AutoAWQConverter currently supports only 4-bit weights"
            )
        if version != "gemm":
            raise ValueError(f"Unsupported AutoAWQ version: {version}")
        self.bits = bits
        self.group_size = group_size
        self.zero_point = zero_point
        self.version = version
        self.ignore = list(ignore)
        self.targets = list(targets)

    @classmethod
    def from_autoawq_config(
        cls, autoawq_config: dict, targets: Iterable[str] = ("Linear",)
    ) -> "AutoAWQConverter":
        ignore = ["lm_head"]
        for module in autoawq_config.get("modules_to_not_convert") or []:
            ignore.append(f"re:.*{re.escape(module)}.*")
        return cls(
            bits=autoawq_config.get("bits", 4),
            group_size=autoawq_config.get("group_size", 128),
            zero_point=autoawq_config.get("zero_point", True),
            version=autoawq_config.get("version", "gemm"),
            ignore=ignore,
            targets=targets,
        )

    def _is_targeted(self, module_name: str) -> bool:
        if any(match_name(module_name, ign) for ign in self.ignore):
            return False
        if len(self.targets) == 0 or "Linear" in self.targets:
            return True
        return any(match_name(module_name, t) for t in self.targets)

    @staticmethod
    def unpack_awq(qweight: np.ndarray, qzeros: np.ndarray | None, bits: int):
        """AWQ int32 -> int8 nibbles (ref autoawq.py:216-236)."""
        shifts = np.arange(0, 32, bits, dtype=np.int64)
        iweights = (
            (qweight[:, :, None].astype(np.int64) >> shifts[None, None, :])
            .astype(np.int8)
            .reshape(qweight.shape[0], -1)
        )
        izeros = None
        if qzeros is not None:
            izeros = (
                (qzeros[:, :, None].astype(np.int64) >> shifts[None, None, :])
                .astype(np.int8)
                .reshape(qzeros.shape[0], -1)
            )
        return iweights, izeros

    @classmethod
    def reverse_awq_order(cls, iweights, izeros, bits: int):
        """Undo AWQ's intra-int32 nibble order (ref autoawq.py:239-262)."""
        order = np.arange(iweights.shape[-1], dtype=np.int64)
        order = order.reshape(-1, 32 // bits)[:, cls.AWQ_REVERSE_ORDER]
        order = order.reshape(-1)
        iweights = iweights[:, order]
        if izeros is not None:
            izeros = izeros[:, order]
        return iweights, izeros

    def _convert_gemm_module(self, qweight, scales, qzeros):
        if self.zero_point and qzeros is None:
            raise ValueError("Found qweight without corresponding qzeros")
        iweight, izeros = self.unpack_awq(qweight, qzeros, self.bits)
        iweight, izeros = self.reverse_awq_order(iweight, izeros, self.bits)

        iweight = iweight & ((2**self.bits) - 1)
        quantized_weight = (iweight - 2 ** (self.bits - 1)).astype(np.int8)

        weight_zero_point = None
        if self.zero_point:
            assert izeros is not None
            zp = (izeros & ((2**self.bits) - 1)) - 2 ** (self.bits - 1)
            weight_zero_point = np.ascontiguousarray(zp.T).astype(np.int8)

        return (
            np.ascontiguousarray(quantized_weight.T),
            np.ascontiguousarray(scales.T),
            weight_zero_point,
        )

    def process(self, tensors: TensorDict) -> TensorDict:
        for name in list(tensors):
            if not name.endswith(".qweight"):
                continue
            module_name = name.removesuffix(".qweight")
            if not self._is_targeted(module_name):
                continue

            qweight = tensors.pop(f"{module_name}.qweight")
            qzeros = tensors.pop(f"{module_name}.qzeros", None)
            scales = tensors.pop(f"{module_name}.scales")
            weight, weight_scale, weight_zp = self._convert_gemm_module(
                np.asarray(qweight), np.asarray(scales),
                np.asarray(qzeros) if qzeros is not None else None,
            )

            tensors[f"{module_name}.weight_scale"] = weight_scale
            tensors[f"{module_name}.weight_packed"] = np.asarray(
                pack_to_int32(jnp.asarray(weight), self.bits)
            )
            tensors[f"{module_name}.weight_shape"] = np.asarray(
                weight.shape, dtype=np.int64
            )
            if weight_zp is not None:
                tensors[f"{module_name}.weight_zero_point"] = np.asarray(
                    pack_to_int32(jnp.asarray(weight_zp), self.bits,
                                  packed_dim=0)
                )
        return tensors

    def validate(self, tensors: TensorDict) -> None:
        for name in tensors:
            module_name, _, param_name = name.rpartition(".")
            if param_name in {"qweight", "qzeros", "scales"}:
                if not self._is_targeted(module_name):
                    raise ValueError(
                        f"Found unexpected non-targeted tensor {name}"
                    )
            if param_name != "qweight" or not self._is_targeted(module_name):
                continue
            for dependency in self.get_dependencies(name):
                if dependency not in tensors:
                    raise ValueError(
                        f"Found qweight without corresponding {dependency}"
                    )

    def create_config(self) -> QuantizationConfig:
        weights = QuantizationArgs(
            num_bits=self.bits,
            type=QuantizationType.INT,
            symmetric=not self.zero_point,
            group_size=self.group_size,
            strategy=QuantizationStrategy.GROUP,
        )
        return QuantizationConfig(
            config_groups={
                "config_group_0": QuantizationScheme(
                    targets=self.targets,
                    weights=weights,
                    format=CompressionFormat.pack_quantized.value,
                )
            },
            ignore=self.ignore,
            format=CompressionFormat.pack_quantized.value,
            quantization_status=QuantizationStatus.COMPRESSED.value,
        )

    def get_dependencies(self, weight_name: str) -> set[str]:
        module_name, _, suffix = weight_name.rpartition(".")
        if suffix == "qweight" and self._is_targeted(module_name):
            deps = {f"{module_name}.scales"}
            if self.zero_point:
                deps.add(f"{module_name}.qzeros")
            return deps
        return set()


# --------------------------------------------------------------------------- #
# CT -> dense dequantizer


class CompressedTensorsDequantizer:
    """CT checkpoint -> dense upconvert using the registered compressors'
    decompress + compression_param_names (ref ct_dequantizer.py:20-171)."""

    def __init__(self, quant_config: QuantizationConfig | dict,
                 ignore: Iterable[str] = (), dtype=ml_dtypes.bfloat16):
        if isinstance(quant_config, dict):
            quant_config = QuantizationConfig.model_validate(quant_config)
        self.quant_config = quant_config
        self.dtype = np.dtype(dtype)
        self.quant_config.ignore = (self.quant_config.ignore or []) + \
            list(ignore)
        for scheme in self.quant_config.config_groups.values():
            if scheme.format is None:
                scheme.format = infer_module_format("Linear", scheme)

    @classmethod
    def from_pretrained(cls, model_stub: str, ignore: Iterable[str] = (),
                        dtype=ml_dtypes.bfloat16):
        from compressed_tensors_tpu.utils.safetensors_io import (
            get_quantization_config_dict,
        )

        qdict = get_quantization_config_dict(model_stub)
        if qdict is None:
            raise ValueError("Could not find quantization_config in config.json")
        return cls(qdict, ignore=ignore, dtype=dtype)

    def process(self, tensors: TensorDict) -> TensorDict:
        from compressed_tensors_tpu.quantization.quant_metadata import (
            KVCacheScaleType,
        )

        dequantized: TensorDict = {}
        tensors = dict(tensors)
        for scheme in self.quant_config.config_groups.values():
            compressor = BaseCompressor.get_value_from_registry(
                CompressionFormat(scheme.format).value
            )
            param_names = compressor.compression_param_names(scheme)
            for module_name, _ in match_quantizable_tensors(
                tensors,
                ignore=self.quant_config.ignore,
                targets=scheme.targets,
                param_targets=[param_names[0]],
            ):
                state_dict = {
                    p: jnp.asarray(tensors.pop(f"{module_name}.{p}"))
                    for p in param_names
                    if f"{module_name}.{p}" in tensors
                }
                out = compressor.decompress(state_dict, scheme)
                dequantized[f"{module_name}.weight"] = np.asarray(
                    out["weight"]
                ).astype(self.dtype)

        kv_names = [v.value for v in KVCacheScaleType]
        for name, tensor in tensors.items():
            if any(name.endswith(p) for p in kv_names):
                continue
            dequantized[name] = tensor
        return dequantized

    def validate(self, tensors: TensorDict) -> None:
        consumed, matched = set(), set()
        for scheme in self.quant_config.config_groups.values():
            compressor = BaseCompressor.get_value_from_registry(
                CompressionFormat(scheme.format).value
            )
            param_names = compressor.compression_param_names(scheme)
            for module_name, _ in match_quantizable_tensors(
                tensors, self.quant_config.ignore, scheme.targets,
                param_targets=[param_names[0]],
            ):
                matched.add(module_name)
                for p in param_names:
                    key = f"{module_name}.{p}"
                    if key not in tensors:
                        raise ValueError(f"Expected key {key} not found")
                    consumed.add(key)
        unconsumed = [
            n for n in tensors
            if n not in consumed and n.rpartition(".")[0] in matched
        ]
        if unconsumed:
            raise ValueError(
                f"Found {len(unconsumed)} unconsumed keys -- {unconsumed}"
            )

    def create_config(self) -> None:
        return None

    def get_dependencies(self, weight_name: str) -> set[str]:
        module_name, _, param_name = weight_name.rpartition(".")
        if any(match_name(module_name, ign)
               for ign in self.quant_config.ignore):
            return set()
        for scheme in self.quant_config.config_groups.values():
            compressor = BaseCompressor.get_value_from_registry(
                CompressionFormat(scheme.format).value
            )
            param_names = compressor.compression_param_names(scheme)
            if "Linear" in scheme.targets or any(
                match_name(module_name, t) for t in scheme.targets
            ):
                if param_name == param_names[0]:
                    return {f"{module_name}.{p}" for p in param_names[1:]}
                return set()
        return set()


# --------------------------------------------------------------------------- #
# ModelOpt NVFP4


class ModelOptNvfp4Converter:
    """NVIDIA ModelOpt NVFP4 -> CT nvfp4-pack-quantized
    (ref modelopt_nvfp4.py:19-155): input_scale and weight_scale_2 are
    inverted, weight renames to weight_packed."""

    def __init__(self, ignore: Iterable[str] = (), targets: Iterable[str] = (),
                 kv_cache_scheme: QuantizationArgs | None = None):
        self.ignore = list(ignore)
        self.targets = list(targets)
        self.kv_cache_scheme = kv_cache_scheme
        self.param_names = ["input_scale", "weight", "weight_scale",
                            "weight_scale_2"]
        if kv_cache_scheme is not None:
            self.param_names += ["k_scale", "v_scale"]

    def process(self, tensors: TensorDict) -> TensorDict:
        tensors = dict(tensors)
        for module_name, name in list(match_quantizable_tensors(
            tensors, self.ignore, self.targets,
            param_targets=self.param_names,
        )):
            param_name = name.rpartition(".")[-1]
            if param_name == "input_scale":
                tensors[f"{module_name}.input_global_scale"] = (
                    1 / np.asarray(tensors[name], dtype=np.float32)
                )
                del tensors[name]
            elif param_name == "weight":
                tensors[f"{module_name}.weight_packed"] = tensors[name]
                del tensors[name]
            elif param_name == "weight_scale_2":
                tensors[f"{module_name}.weight_global_scale"] = (
                    1 / np.asarray(tensors[name], dtype=np.float32)
                )
                del tensors[name]
            elif param_name in ("k_scale", "v_scale"):
                target = (self.kv_cache_scheme.scale_dtype
                          or np.dtype(ml_dtypes.bfloat16))
                tensors[name] = np.asarray(tensors[name]).astype(
                    np.dtype(target)
                )
        return tensors

    def validate(self, tensors: TensorDict) -> None:
        targeted = {
            name for _, name in match_quantizable_tensors(
                tensors, self.ignore, self.targets,
                param_targets=self.param_names,
            )
        }
        disallowed = {"input_scale", "weight_scale", "weight_scale_2",
                      "k_scale", "v_scale"}
        for name in tensors:
            if name in targeted:
                continue
            if any(match_name(name, ign) for ign in self.ignore):
                continue
            if name.rpartition(".")[-1] in disallowed:
                raise ValueError(f"Hit unexpected non-targeted tensor {name}")

    def get_dependencies(self, weight_name: str) -> set[str]:
        module_name, _, param_name = weight_name.rpartition(".")
        if (
            any(match_name(module_name, t) for t in self.targets)
            and not any(match_name(module_name, ign) for ign in self.ignore)
            and param_name == "weight"
        ):
            deps = {
                f"{module_name}.input_scale",
                f"{module_name}.weight_scale",
                f"{module_name}.weight_scale_2",
            }
            if self.kv_cache_scheme:
                if module_name.endswith("k_proj"):
                    deps.add(f"{module_name}.k_scale")
                if module_name.endswith("v_proj"):
                    deps.add(f"{module_name}.v_scale")
            return deps
        return set()

    def create_config(self) -> QuantizationConfig:
        return QuantizationConfig(
            config_groups={
                "config_group_0": QuantizationScheme(
                    **NVFP4,
                    targets=self.targets,
                    format=CompressionFormat.nvfp4_pack_quantized.value,
                )
            },
            ignore=self.ignore,
            kv_cache_scheme=self.kv_cache_scheme,
            format=CompressionFormat.nvfp4_pack_quantized.value,
            quantization_status=QuantizationStatus.COMPRESSED.value,
        )


# --------------------------------------------------------------------------- #
# DeepSeek-style FP8 block dequantizer


class FP8BlockDequantizer:
    """FP8 128x128-block checkpoint (weight + weight_scale_inv) -> dense
    (ref fp8block_dequantizer.py:15-158)."""

    def __init__(self, ignore: Iterable[str] = (), targets: Iterable[str] = (),
                 weight_block_size=(128, 128), dtype=ml_dtypes.bfloat16):
        self.ignore = list(ignore)
        self.targets = list(targets)
        self.weight_block_size = tuple(weight_block_size)
        self.dtype = np.dtype(dtype)
        self.param_names = ["weight", "weight_scale_inv"]

    def _dequantize(self, weight: np.ndarray, scale_inv: np.ndarray):
        bh, bw = self.weight_block_size
        rows, cols = weight.shape
        pad_r = (bh - rows % bh) % bh
        pad_c = (bw - cols % bw) % bw
        w = weight.astype(np.float32)
        if pad_r or pad_c:
            w = np.pad(w, ((0, pad_r), (0, pad_c)))
        R, C = w.shape
        w = w.reshape(R // bh, bh, C // bw, bw)
        s = scale_inv.astype(np.float32)[:, None, :, None]
        w = (w * s).reshape(R, C)[:rows, :cols]
        return w.astype(self.dtype)

    def process(self, tensors: TensorDict) -> TensorDict:
        tensors = dict(tensors)
        for module_name, name in list(match_quantizable_tensors(
            tensors, self.ignore, self.targets,
            param_targets=self.param_names,
        )):
            if name.rpartition(".")[-1] == "weight" and \
                    f"{module_name}.weight_scale_inv" in tensors:
                tensors[f"{module_name}.weight"] = self._dequantize(
                    np.asarray(tensors[f"{module_name}.weight"]),
                    np.asarray(tensors.pop(f"{module_name}.weight_scale_inv")),
                )
        return tensors

    def validate(self, tensors: TensorDict) -> None:
        for module_name, name in match_quantizable_tensors(
            tensors, self.ignore, self.targets,
            param_targets=["weight_scale_inv"],
        ):
            if f"{module_name}.weight" not in tensors:
                raise ValueError(
                    f"Found weight_scale_inv without weight for {module_name}"
                )

    def create_config(self) -> None:
        return None

    def get_dependencies(self, weight_name: str) -> set[str]:
        module_name, _, param_name = weight_name.rpartition(".")
        if (
            any(match_name(module_name, t) for t in self.targets)
            and not any(match_name(module_name, ign) for ign in self.ignore)
            and param_name == "weight"
        ):
            return {f"{module_name}.weight_scale_inv"}
        return set()
