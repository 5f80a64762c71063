"""Format codecs: stateless classmethod compressors over per-module state
dicts of jnp arrays.

Mirrors `compressed_tensors/compressors/base.py:34-219`: codecs are never
instantiated; they are looked up in the registry by CompressionFormat value
and called as ``compress(state_dict, scheme)`` / ``decompress(...)`` where
keys are local names ("weight", "weight_scale", ...).
"""

from __future__ import annotations

from abc import ABC
from typing import Dict, Optional

import jax.numpy as jnp

from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.quantization import QuantizationScheme
from compressed_tensors_tpu.registry import RegistryMixin

__all__ = [
    "BaseCompressor",
    "TensorStateDict",
    "COMPRESSIBLE_MODULE_TYPES",
]

TensorStateDict = Dict[str, jnp.ndarray]

# module types whose weights can be compressed (ref base.py:31)
COMPRESSIBLE_MODULE_TYPES = ("Linear", "Embedding")


class BaseCompressor(RegistryMixin, ABC):
    """Base class for compression-format codecs.

    Look up via ``BaseCompressor.get_value_from_registry(format)`` and call
    the classmethods directly on the returned class.
    """

    @classmethod
    def compression_param_names(cls, scheme: QuantizationScheme) -> tuple[str, ...]:
        """Names of parameters introduced by this compressor during
        compression (ref base.py:47-58)."""
        raise NotImplementedError(
            f"{cls.__name__} does not implement compression_param_names"
        )

    @classmethod
    def compress(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme
    ) -> TensorStateDict:
        """Compress a per-module state dict; does not modify the input."""
        raise NotImplementedError(f"{cls.__name__} does not implement compress")

    @classmethod
    def decompress(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme
    ) -> TensorStateDict:
        """Decompress a per-module state dict; does not modify the input."""
        raise NotImplementedError(f"{cls.__name__} does not implement decompress")

    @classmethod
    def can_compress(cls, module_type: str, scheme: QuantizationScheme) -> bool:
        """True if this codec applies to (module type, scheme)."""
        raise NotImplementedError(f"{cls.__name__} does not implement can_compress")

    @classmethod
    def _remove_symmetric_zp(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme
    ) -> TensorStateDict:
        """Drop zero points for symmetric schemes (vLLM does not accept them;
        ref base.py:148-167)."""
        if scheme.input_activations and scheme.input_activations.symmetric:
            state_dict.pop("input_zero_point", None)
        if scheme.weights and scheme.weights.symmetric:
            state_dict.pop("weight_zero_point", None)
        if scheme.output_activations and scheme.output_activations.symmetric:
            state_dict.pop("output_zero_point", None)
        return state_dict


def get_compressor(format: str | CompressionFormat) -> type[BaseCompressor]:
    value = format.value if isinstance(format, CompressionFormat) else format
    return BaseCompressor.get_value_from_registry(value)


def compress_state_dict(
    state_dict: TensorStateDict,
    scheme: QuantizationScheme,
    format: Optional[str] = None,
) -> TensorStateDict:
    """Compress one module's state dict, resolving the format from
    (1) the `format` argument, (2) scheme.format, (3) inference
    (ref base.py:170-193)."""
    from compressed_tensors_tpu.compressors.format import infer_module_format

    fmt = CompressionFormat(
        format or scheme.format or infer_module_format("Linear", scheme)
    )
    scheme.format = fmt
    return get_compressor(fmt).compress(state_dict, scheme)


def decompress_state_dict(
    state_dict: TensorStateDict,
    scheme: QuantizationScheme,
    format: Optional[str] = None,
) -> TensorStateDict:
    """Decompress one module's state dict (ref base.py:196-219)."""
    from compressed_tensors_tpu.compressors.format import infer_module_format

    fmt = CompressionFormat(
        format or scheme.format or infer_module_format("Linear", scheme)
    )
    scheme.format = fmt
    return get_compressor(fmt).decompress(state_dict, scheme)
