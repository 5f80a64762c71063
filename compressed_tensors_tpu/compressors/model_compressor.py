"""ModelCompressor: whole-model compress/decompress orchestration +
config.json I/O.

Functional analogue of `compressors/model_compressors/model_compressor.py`
(:36-273). Instead of mutating torch modules it maps per-module state dicts
(pytrees of jnp arrays) through format codecs, using the same
target-matching, ignore and format-inference semantics.

Save lifecycle:  resolve schemes -> compress each matched module ->
write shards + update_config.
Load lifecycle:  parse quantization_config -> resolve schemes ->
read shards -> (optionally) decompress, or hand compressed state dicts to
the engine for run-compressed inference (the default on TPU).
"""

from __future__ import annotations

import os
from typing import Callable, Mapping

import numpy as np

from compressed_tensors_tpu.compressors.base import (
    BaseCompressor,
    TensorStateDict,
    get_compressor,
)
from compressed_tensors_tpu.compressors.format import (
    infer_format_from_schemes,
    infer_module_format,
)
from compressed_tensors_tpu.config import (
    CompressionFormat,
    SparsityCompressionConfig,
)
from compressed_tensors_tpu.quantization import (
    QuantizationConfig,
    QuantizationScheme,
    QuantizationStatus,
)
from compressed_tensors_tpu.utils.match import (
    ModuleInfo,
    is_match,
    match_targets,
)
from compressed_tensors_tpu.utils.safetensors_io import (
    CheckpointReader,
    get_quantization_config_dict,
    save_safetensors,
    update_config,
    update_safetensors_index,
)

__all__ = ["ModelCompressor", "module_graph_from_names", "resolve_module_schemes"]


def module_graph_from_names(
    module_names: list[str],
    embedding_names: tuple[str, ...] = ("embed_tokens", "wte", "embeddings"),
) -> dict[str, ModuleInfo]:
    """Build a matching-compatible module graph from checkpoint module
    prefixes. Weight-bearing modules are Linear unless they look like
    embeddings; ancestor modules are generic containers so class matching
    behaves like named_modules traversal."""
    graph: dict[str, ModuleInfo] = {}
    for name in module_names:
        parts = name.split(".")
        # register ancestors as containers
        for i in range(1, len(parts)):
            prefix = ".".join(parts[:i])
            graph.setdefault(prefix, ModuleInfo(type_name="Module"))
        leaf = parts[-1]
        if any(e in leaf for e in embedding_names):
            graph[name] = ModuleInfo(type_name="Embedding")
        else:
            graph[name] = ModuleInfo(type_name="Linear")
    return graph


def resolve_module_schemes(
    modules: Mapping[str, ModuleInfo],
    config: QuantizationConfig,
) -> dict[str, QuantizationScheme]:
    """Map each module to its quantization scheme via target matching with
    ignore-list handling (the scheme-resolution core of
    apply_quantization_config, ref lifecycle/apply.py:100-170).

    When multiple targets match, the most specific wins
    (exact > regex > class, ref match_targets ordering)."""
    # ordered target -> scheme (later config groups append after earlier)
    target_to_scheme: dict[str, QuantizationScheme] = {}
    for scheme in config.config_groups.values():
        for target in scheme.targets:
            target_to_scheme[target] = scheme

    ignore = config.ignore or []
    resolved: dict[str, QuantizationScheme] = {}
    for name, info in modules.items():
        if info.type_name == "Module":
            continue
        matched = match_targets(name, info, list(target_to_scheme))
        if not matched:
            continue
        if is_match(name, info, ignore):
            continue
        resolved[name] = target_to_scheme[matched[0]]
    return resolved


class ModelCompressor:
    """Whole-model compression orchestrator."""

    def __init__(
        self,
        quantization_config: QuantizationConfig | None = None,
        sparsity_config: SparsityCompressionConfig | None = None,
        transform_config=None,
        force_compression_format: str | None = None,
    ):
        self.quantization_config = quantization_config
        self.sparsity_config = sparsity_config
        self.transform_config = transform_config
        self.force_compression_format = force_compression_format

    # ------------------------------------------------------------------ #
    # constructors

    @classmethod
    def from_compression_config(cls, config: dict) -> "ModelCompressor | None":
        """Build from a raw config.json["quantization_config"] dict
        (ref model_compressor.py:64-86)."""
        if config is None:
            return None
        sparsity_config = config.get("sparsity_config") or None
        if sparsity_config:
            fmt = sparsity_config.get("format", "dense")
            sparsity_config = SparsityCompressionConfig.load_from_registry(
                fmt, **sparsity_config
            )
        qconfig = {
            k: v
            for k, v in config.items()
            if k not in ("sparsity_config", "transform_config", "version")
        }
        quantization_config = (
            QuantizationConfig.model_validate(qconfig)
            if qconfig.get("config_groups") is not None
            else None
        )
        if quantization_config is None and sparsity_config is None:
            return None
        return cls(
            quantization_config=quantization_config,
            sparsity_config=sparsity_config,
        )

    @classmethod
    def from_pretrained(cls, path: str) -> "ModelCompressor | None":
        """Build from a checkpoint directory's config.json."""
        qdict = get_quantization_config_dict(path)
        if qdict is None:
            return None
        return cls.from_compression_config(qdict)

    # ------------------------------------------------------------------ #
    # scheme resolution

    def resolve_schemes(
        self, modules: Mapping[str, ModuleInfo]
    ) -> dict[str, QuantizationScheme]:
        if self.quantization_config is None:
            return {}
        return resolve_module_schemes(modules, self.quantization_config)

    def _global_format(self) -> str | None:
        """The model-level format applies to every module unless the config is
        mixed-precision (then per-scheme/inferred formats win)."""
        if self.quantization_config is None:
            return None
        fmt = self.quantization_config.format
        if fmt in (
            "fakequant",
            CompressionFormat.dense.value,
            CompressionFormat.mixed_precision.value,
            None,
        ):
            return None
        return fmt

    def _module_compressor(
        self, module_type: str, scheme: QuantizationScheme
    ) -> type[BaseCompressor]:
        fmt = CompressionFormat(
            self.force_compression_format
            or scheme.format
            or self._global_format()
            or infer_module_format(module_type, scheme)
        )
        scheme.format = fmt
        return get_compressor(fmt)

    # ------------------------------------------------------------------ #
    # compress / decompress

    def compress_state(
        self,
        module_states: Mapping[str, TensorStateDict],
        modules: Mapping[str, ModuleInfo],
        progress: Callable | None = None,
    ) -> dict[str, TensorStateDict]:
        """Compress every matched module's local state dict
        (ref compress_model, model_compressor.py:138-172). A sparsity config
        stacks the sparse codec over the quantized representation for
        matched modules."""
        schemes = self.resolve_schemes(modules)
        out: dict[str, TensorStateDict] = {}
        for name, state in module_states.items():
            state = dict(state)
            scheme = schemes.get(name)
            if scheme is not None and scheme.weights is not None:
                compressor = self._module_compressor(
                    modules[name].type_name, scheme
                )
                state = compressor.compress(state, scheme)
            if self._sparsity_applies(name, modules.get(name)):
                sparse_compressor = get_compressor(self.sparsity_config.format)
                if "weight" in state:
                    state = sparse_compressor.compress(state, scheme)
            out[name] = state
            if progress is not None:
                progress(name)
        if self.quantization_config is not None:
            self.quantization_config.quantization_status = (
                QuantizationStatus.COMPRESSED
            )
        return out

    def decompress_state(
        self,
        module_states: Mapping[str, TensorStateDict],
        modules: Mapping[str, ModuleInfo],
        progress: Callable | None = None,
    ) -> dict[str, TensorStateDict]:
        """Decompress every matched module (ref decompress_model,
        model_compressor.py:183-207)."""
        schemes = self.resolve_schemes(modules)
        out: dict[str, TensorStateDict] = {}
        for name, state in module_states.items():
            state = dict(state)
            if self._sparsity_applies(name, modules.get(name)) and \
                    "weight.compressed" in state:
                sparse_compressor = get_compressor(self.sparsity_config.format)
                state = sparse_compressor.decompress(state, None)
            scheme = schemes.get(name)
            if scheme is not None and scheme.weights is not None and (
                "weight_packed" in state
                or ("weight" in state and self._is_quantized_repr(state))
            ):
                compressor = self._module_compressor(
                    modules[name].type_name, scheme
                )
                state = compressor.decompress(state, scheme)
            out[name] = state
            if progress is not None:
                progress(name)
        if self.quantization_config is not None:
            self.quantization_config.quantization_status = (
                QuantizationStatus.DECOMPRESSED
            )
        return out

    @staticmethod
    def _is_quantized_repr(state: TensorStateDict) -> bool:
        w = state.get("weight")
        if w is None:
            return False
        kind = np.dtype(w.dtype).kind
        return kind in "iu" or str(w.dtype).startswith("float8")

    def _sparsity_applies(self, name: str, info: ModuleInfo | None) -> bool:
        if self.sparsity_config is None or info is None:
            return False
        if self.sparsity_config.format == CompressionFormat.dense.value:
            return False
        targets = self.sparsity_config.targets or ["Linear"]
        ignore = self.sparsity_config.ignore or []
        return is_match(name, info, targets, ignore)

    # ------------------------------------------------------------------ #
    # checkpoint-level save / load

    def save_checkpoint(
        self,
        save_directory: str,
        module_states: Mapping[str, TensorStateDict],
        modules: Mapping[str, ModuleInfo],
        extra_tensors: Mapping[str, np.ndarray] | None = None,
        max_shard_bytes: int = 5 * 1024**3,
    ) -> None:
        """Compress and write a sharded safetensors checkpoint + index +
        config.json (the save path of ref model_compressor.py:40-56)."""
        os.makedirs(save_directory, exist_ok=True)
        compressed = self.compress_state(module_states, modules)

        flat: dict[str, np.ndarray] = {}
        for mod_name, state in compressed.items():
            for local, tensor in state.items():
                full = f"{mod_name}.{local}" if mod_name else local
                flat[full] = np.asarray(tensor)
        for name, tensor in (extra_tensors or {}).items():
            flat[name] = np.asarray(tensor)

        # shard by size
        shards: list[dict[str, np.ndarray]] = [{}]
        sizes = [0]
        for name, tensor in flat.items():
            if sizes[-1] + tensor.nbytes > max_shard_bytes and shards[-1]:
                shards.append({})
                sizes.append(0)
            shards[-1][name] = tensor
            sizes[-1] += tensor.nbytes

        weight_map: dict[str, str] = {}
        if len(shards) == 1:
            fname = "model.safetensors"
            save_safetensors(os.path.join(save_directory, fname), shards[0],
                             metadata={"format": "pt"})
            for name in shards[0]:
                weight_map[name] = fname
        else:
            n = len(shards)
            for i, shard in enumerate(shards):
                fname = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
                save_safetensors(os.path.join(save_directory, fname), shard,
                                 metadata={"format": "pt"})
                for name in shard:
                    weight_map[name] = fname
            update_safetensors_index(save_directory, weight_map)

        self.update_config(save_directory)

    def load_checkpoint(
        self,
        path: str,
        modules: Mapping[str, ModuleInfo] | None = None,
        run_compressed: bool = True,
    ) -> tuple[dict[str, TensorStateDict], dict[str, QuantizationScheme]]:
        """Read a checkpoint into per-module state dicts.

        :param run_compressed: if True (the TPU default — the whole point is
            fused dequant kernels), returns compressed representations;
            if False, decompresses to dense weights like the reference's
            default load path.
        :return: (module states, resolved schemes)
        """
        reader = CheckpointReader(path)
        module_names = reader.module_names()
        if modules is None:
            modules = module_graph_from_names(module_names)

        module_states = {
            name: {k: v for k, v in reader.module_state_dict(name).items()}
            for name in module_names
        }
        schemes = self.resolve_schemes(modules)
        if not run_compressed:
            module_states = self.decompress_state(module_states, modules)
        return module_states, schemes

    def update_config(self, save_directory: str) -> None:
        if not any((self.quantization_config, self.transform_config)):
            return
        update_config(
            save_directory,
            quantization_config=self.quantization_config,
            transform_config=self.transform_config,
        )
