"""Dense (identity) compressor — the fallback terminator of the format
priority list (ref compressors/dense/base.py)."""

from __future__ import annotations

from compressed_tensors_tpu.compressors.base import (
    BaseCompressor,
    TensorStateDict,
)
from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.quantization import QuantizationScheme

__all__ = ["DenseCompressor"]


@BaseCompressor.register(name=CompressionFormat.dense.value)
class DenseCompressor(BaseCompressor):
    @classmethod
    def compression_param_names(cls, scheme: QuantizationScheme) -> tuple[str, ...]:
        return ("weight",)

    @classmethod
    def compress(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme
    ) -> TensorStateDict:
        return dict(state_dict)

    @classmethod
    def decompress(
        cls, state_dict: TensorStateDict, scheme: QuantizationScheme
    ) -> TensorStateDict:
        return dict(state_dict)

    @classmethod
    def can_compress(cls, module_type: str, scheme: QuantizationScheme) -> bool:
        return True
