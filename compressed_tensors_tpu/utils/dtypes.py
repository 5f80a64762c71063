"""Dtype vocabulary shared across the framework.

The on-disk format (config.json + safetensors) uses torch dtype names like
``"torch.float8_e4m3fn"``; this module maps those byte-compatibly onto
numpy/ml_dtypes dtypes usable from JAX. Mirrors the semantics of the
reference's ``utils/type.py`` (TorchDtype annotation) without torch.
"""

from __future__ import annotations

from typing import Annotated, Any

import jax.numpy as jnp
import ml_dtypes
import numpy as np
from pydantic import GetCoreSchemaHandler
from pydantic_core import core_schema

__all__ = [
    "TensorDType",
    "parse_dtype",
    "serialize_dtype",
    "is_float_dtype",
    "dtype_bits",
    "finfo_max",
    "finfo_min",
    "finfo_eps",
    "SAFETENSORS_DTYPES",
]

# canonical names -> numpy dtype. Names intentionally match torch dtype names
# so that `torch.<name>` round-trips through config.json.
_NAME_TO_DTYPE: dict[str, np.dtype] = {
    "float64": np.dtype(np.float64),
    "float32": np.dtype(np.float32),
    "float16": np.dtype(np.float16),
    "bfloat16": np.dtype(ml_dtypes.bfloat16),
    "float8_e4m3fn": np.dtype(ml_dtypes.float8_e4m3fn),
    "float8_e5m2": np.dtype(ml_dtypes.float8_e5m2),
    "int64": np.dtype(np.int64),
    "int32": np.dtype(np.int32),
    "int16": np.dtype(np.int16),
    "int8": np.dtype(np.int8),
    "uint8": np.dtype(np.uint8),
    "uint16": np.dtype(np.uint16),
    "uint32": np.dtype(np.uint32),
    "uint64": np.dtype(np.uint64),
    "bool": np.dtype(np.bool_),
    # ml_dtypes sub-byte / exotic types used by newer checkpoints
    "float8_e8m0fnu": np.dtype(ml_dtypes.float8_e8m0fnu),
    "float4_e2m1fn_x2": np.dtype(ml_dtypes.float4_e2m1fn),
}

_DTYPE_TO_NAME: dict[np.dtype, str] = {v: k for k, v in _NAME_TO_DTYPE.items()}

# safetensors header dtype strings <-> numpy dtypes
SAFETENSORS_DTYPES: dict[str, np.dtype] = {
    "F64": np.dtype(np.float64),
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "BF16": np.dtype(ml_dtypes.bfloat16),
    "F8_E4M3": np.dtype(ml_dtypes.float8_e4m3fn),
    "F8_E5M2": np.dtype(ml_dtypes.float8_e5m2),
    "F8_E8M0": np.dtype(ml_dtypes.float8_e8m0fnu),
    "I64": np.dtype(np.int64),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "U16": np.dtype(np.uint16),
    "U32": np.dtype(np.uint32),
    "U64": np.dtype(np.uint64),
    "BOOL": np.dtype(np.bool_),
}


def parse_dtype(value: Any) -> np.dtype:
    """Parse ``"torch.int8"``, ``"int8"``, numpy dtype, or jnp dtype."""
    if isinstance(value, str):
        name = value.removeprefix("torch.")
        if name not in _NAME_TO_DTYPE:
            raise ValueError(f"No such dtype `torch.{name}`")
        return _NAME_TO_DTYPE[name]
    dt = np.dtype(value)
    if dt not in _DTYPE_TO_NAME:
        raise ValueError(f"Unsupported dtype {value}")
    return dt


def serialize_dtype(dtype: np.dtype | None) -> str | None:
    """Serialize to the checkpoint-compatible ``torch.<name>`` string."""
    if dtype is None:
        return None
    return f"torch.{_DTYPE_TO_NAME[np.dtype(dtype)]}"


def is_float_dtype(dtype: np.dtype) -> bool:
    return np.dtype(dtype).kind == "f" or str(np.dtype(dtype)).startswith(
        ("bfloat16", "float8", "float4", "float6")
    )


def dtype_bits(dtype: np.dtype) -> int:
    return np.dtype(dtype).itemsize * 8


def finfo_max(dtype: np.dtype) -> float:
    return float(ml_dtypes.finfo(dtype).max)


def finfo_min(dtype: np.dtype) -> float:
    return float(ml_dtypes.finfo(dtype).min)


def finfo_eps(dtype: np.dtype) -> float:
    return float(ml_dtypes.finfo(dtype).eps)


class _TensorDTypeAnnotation:
    """Pydantic annotation: validates torch-style strings / numpy dtypes,
    serializes as ``torch.<name>`` for config.json compatibility."""

    @classmethod
    def __get_pydantic_core_schema__(
        cls, _source_type: Any, _handler: GetCoreSchemaHandler
    ) -> core_schema.CoreSchema:
        from_any = core_schema.no_info_plain_validator_function(parse_dtype)
        return core_schema.json_or_python_schema(
            json_schema=core_schema.chain_schema(
                [core_schema.str_schema(), from_any]
            ),
            python_schema=from_any,
            serialization=core_schema.plain_serializer_function_ser_schema(
                serialize_dtype
            ),
        )


TensorDType = Annotated[np.dtype, _TensorDTypeAnnotation]
# jnp view of the same names, for convenience in ops code
JNP = jnp
