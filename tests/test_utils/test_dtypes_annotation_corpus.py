"""TensorDType pydantic-annotation corpus, ported from the reference's
tests/test_utils/test_type.py (TorchDtype): default values, overrides,
string validation with and without the "torch." prefix, and dump/validate
round-trips. The serialized form keeps the torch-prefixed names so real
config.json files stay byte-compatible."""

import ml_dtypes
import numpy as np
import pytest
from pydantic import BaseModel, Field, ValidationError

from compressed_tensors_tpu.utils.dtypes import (
    TensorDType,
    parse_dtype,
    serialize_dtype,
)

F32 = np.dtype(np.float32)
F16 = np.dtype(np.float16)


class DummyModel(BaseModel):
    dtype: TensorDType = Field(default=F32)


def test_default_value():
    assert DummyModel().dtype == F32


def test_value_override():
    model = DummyModel()
    model.dtype = F16
    assert model.dtype == F16


def test_validation():
    DummyModel(dtype=F16)
    DummyModel(dtype="torch.float16")
    DummyModel(dtype="float16")
    with pytest.raises(ValidationError):
        DummyModel(dtype="notatype")


def test_serialization():
    model = DummyModel()
    assert model.model_dump()["dtype"] == "torch.float32"
    assert DummyModel.model_validate(model.model_dump()) == model

    model = DummyModel(dtype=F16)
    assert model.model_dump()["dtype"] == "torch.float16"
    assert DummyModel.model_validate(model.model_dump()) == model

    model = DummyModel()
    model.dtype = F16
    assert model.model_dump()["dtype"] == "torch.float16"
    assert DummyModel.model_validate(model.model_dump()) == model


def test_deserialization():
    assert DummyModel.model_validate({"dtype": "torch.float16"}).dtype == F16
    assert DummyModel.model_validate({"dtype": "float16"}).dtype == F16
    with pytest.raises(ValueError):
        DummyModel.model_validate({"dtype": "notatype"})
    with pytest.raises(ValueError):
        DummyModel.model_validate({"dtype": "torch.notatype"})


@pytest.mark.parametrize("name,np_dtype", [
    ("torch.bfloat16", np.dtype(ml_dtypes.bfloat16)),
    ("torch.float8_e4m3fn", np.dtype(ml_dtypes.float8_e4m3fn)),
    ("torch.int8", np.dtype(np.int8)),
    ("uint8", np.dtype(np.uint8)),
])
def test_parse_serialize_round_trip(name, np_dtype):
    parsed = parse_dtype(name)
    assert parsed == np_dtype
    serialized = serialize_dtype(parsed)
    assert serialized.removeprefix("torch.") == name.removeprefix("torch.")
    assert parse_dtype(serialized) == np_dtype
