"""Sparse compressors: sparse-bitmask (unstructured) and sparse-24-bitmask
(2:4 structured).

The reference removed these implementations (`model_compressor.py:73-80`
raises for Sparse24 configs) but the serialized formats are still part of the
checkpoint ecosystem and BASELINE config 4 requires them, so they are
implemented here from the format spec:

- ``<param>.compressed``: nonzero values (1-D for unstructured; dense
  (R, C/2) for 2:4)
- ``<param>.bitmask``: packed little-endian bit rows, (R, ceil(C/8)) uint8
- ``<param>.shape``: original dense shape
- ``<param>.row_offsets``: per-row start offsets (unstructured only)

Sparse compressors can stack over quantization compressors: the quantized
(pre-pack) weight is sparsified first, then the sparse codec stores its
nonzero values (which may themselves be int8/fp8 quantized values).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from compressed_tensors_tpu.compressors.base import (
    BaseCompressor,
    TensorStateDict,
)
from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.ops.bitmask import (
    bitmask_compress,
    bitmask_decompress,
    sparse24_compress,
    sparse24_decompress,
)
from compressed_tensors_tpu.quantization import QuantizationScheme

__all__ = ["BitmaskCompressor", "Sparse24BitMaskCompressor"]


@BaseCompressor.register(name=CompressionFormat.sparse_bitmask.value)
class BitmaskCompressor(BaseCompressor):
    """Unstructured sparsity via bitmask + packed nonzero values."""

    COMPRESSION_PARAM_SUFFIXES = ("compressed", "bitmask", "shape", "row_offsets")

    @classmethod
    def compression_param_names(
        cls, scheme: QuantizationScheme | None = None
    ) -> tuple[str, ...]:
        return tuple(f"weight.{s}" for s in cls.COMPRESSION_PARAM_SUFFIXES)

    @classmethod
    def compress(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme | None = None
    ) -> TensorStateDict:
        state_dict = dict(state_dict)
        weight = state_dict.pop("weight")
        values, bitmask, row_offsets = bitmask_compress(weight)
        state_dict["weight.compressed"] = values
        state_dict["weight.bitmask"] = bitmask
        state_dict["weight.shape"] = jnp.asarray(weight.shape, dtype=jnp.int32)
        state_dict["weight.row_offsets"] = row_offsets
        return state_dict

    @classmethod
    def decompress(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme | None = None
    ) -> TensorStateDict:
        state_dict = dict(state_dict)
        values = state_dict.pop("weight.compressed")
        bitmask = state_dict.pop("weight.bitmask")
        shape = tuple(int(v) for v in np.asarray(state_dict.pop("weight.shape")))
        state_dict.pop("weight.row_offsets", None)
        state_dict["weight"] = bitmask_decompress(values, bitmask, shape)
        return state_dict

    @classmethod
    def can_compress(cls, module_type: str, scheme) -> bool:
        return True


@BaseCompressor.register(name=CompressionFormat.sparse_24_bitmask.value)
class Sparse24BitMaskCompressor(BaseCompressor):
    """2:4 structured sparsity: dense (R, C/2) values + bitmask."""

    COMPRESSION_PARAM_SUFFIXES = ("compressed", "bitmask", "shape")

    @classmethod
    def compression_param_names(
        cls, scheme: QuantizationScheme | None = None
    ) -> tuple[str, ...]:
        return tuple(f"weight.{s}" for s in cls.COMPRESSION_PARAM_SUFFIXES)

    @classmethod
    def compress(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme | None = None
    ) -> TensorStateDict:
        state_dict = dict(state_dict)
        weight = state_dict.pop("weight")
        compressed, bitmask = sparse24_compress(weight)
        state_dict["weight.compressed"] = compressed
        state_dict["weight.bitmask"] = bitmask
        state_dict["weight.shape"] = jnp.asarray(weight.shape, dtype=jnp.int32)
        return state_dict

    @classmethod
    def decompress(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme | None = None
    ) -> TensorStateDict:
        state_dict = dict(state_dict)
        compressed = state_dict.pop("weight.compressed")
        bitmask = state_dict.pop("weight.bitmask")
        shape = tuple(int(v) for v in np.asarray(state_dict.pop("weight.shape")))
        state_dict["weight"] = sparse24_decompress(compressed, bitmask, shape)
        return state_dict

    @classmethod
    def can_compress(cls, module_type: str, scheme) -> bool:
        return True
