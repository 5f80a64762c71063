"""Transform config schemas (TransformArgs / Scheme / Config).

Byte-compatible with `transform/transform_args.py:13-73`,
`transform_scheme.py:13-42`, `transform_config.py` so serialized
``transform_config`` blocks in config.json parse identically.
"""

from __future__ import annotations

from enum import Enum

import numpy as np
from pydantic import BaseModel, ConfigDict, Field, field_validator

from compressed_tensors_tpu.utils.dtypes import TensorDType

__all__ = ["TransformArgs", "TransformLocation", "TransformScheme",
           "TransformConfig"]


class TransformLocation(str, Enum):
    """Where a transform applies on a module. WEIGHT_* are offline (fused
    into weights at load); the rest are online (applied at runtime)."""

    INPUT = "input"
    WEIGHT_INPUT = "weight_input"
    WEIGHT_OUTPUT = "weight_output"
    OUTPUT = "output"
    K_CACHE = "k_cache"
    Q_ATTN = "q_attn"

    def is_online(self) -> bool:
        return self not in (
            TransformLocation.WEIGHT_INPUT,
            TransformLocation.WEIGHT_OUTPUT,
        )


class TransformArgs(BaseModel, use_enum_values=True):
    """How and where one transform weight applies.

    :param targets: module targets (names/regex/classes)
    :param location: one of TransformLocation
    :param inverse: apply the inverse of the transform
    :param ignore: modules to exclude
    """

    targets: list[str]
    location: TransformLocation
    inverse: bool = Field(default=False)
    ignore: list[str] = Field(default_factory=list)

    @field_validator("targets", "ignore", mode="before")
    @classmethod
    def wrap_singleton(cls, value):
        if isinstance(value, str):
            return [value]
        return value

    def is_online(self) -> bool:
        return TransformLocation(self.location).is_online()

    model_config = ConfigDict(extra="forbid")


class TransformScheme(BaseModel):
    """One transform type + where to apply it.

    :param type: registered transform type ("hadamard", "random-hadamard",
        "random-matrix")
    :param apply: list of TransformArgs
    :param randomize: unique randomized weights per application
    :param requires_grad: trainable transform weights
    :param head_dim: block-diagonal block size
    :param precision: online application precision (fused rotations always
        run in float64 on host)
    """

    type: str
    apply: list[TransformArgs] = Field(default_factory=list)
    randomize: bool = Field(default=False)
    requires_grad: bool = Field(default=False)
    head_dim: int | None = Field(default=None)
    precision: TensorDType = Field(default=np.dtype(np.float32))

    model_config = ConfigDict(extra="forbid")


class TransformConfig(BaseModel):
    """Full transform configuration: name -> scheme."""

    config_groups: dict[str, TransformScheme]

    model_config = ConfigDict(extra="forbid")
