"""QuantizationArgs validation/inference semantics (mirrors reference
tests/test_quantization/test_quant_args.py coverage)."""

import numpy as np
import pytest

from compressed_tensors_tpu.quantization import (
    ActivationOrdering,
    QuantizationArgs,
    QuantizationStrategy,
)


def test_defaults():
    args = QuantizationArgs()
    assert args.num_bits == 8
    assert args.type == "int"
    assert args.symmetric is True
    assert args.strategy == QuantizationStrategy.TENSOR.value
    assert args.observer == "memoryless_minmax"
    assert np.dtype(args.zp_dtype) == np.dtype(np.int8)


def test_group_strategy_inference():
    assert QuantizationArgs(group_size=128).strategy == "group"
    assert QuantizationArgs(group_size=-1).strategy == "channel"
    with pytest.raises(ValueError):
        QuantizationArgs(group_size=-2)


def test_group_requires_group_size():
    with pytest.raises(ValueError):
        QuantizationArgs(strategy="group")
    with pytest.raises(ValueError):
        QuantizationArgs(strategy="tensor", group_size=128)


def test_block_validation():
    args = QuantizationArgs(strategy="block", block_structure=[128, 128])
    assert args.block_structure == [128, 128]
    # legacy "RxC" string form
    args = QuantizationArgs(strategy="block", block_structure="2x4")
    assert args.block_structure == [2, 4]
    with pytest.raises(ValueError):
        QuantizationArgs(strategy="block")
    with pytest.raises(ValueError):
        QuantizationArgs(block_structure=[128, 128])


def test_token_requires_dynamic():
    with pytest.raises(ValueError):
        QuantizationArgs(strategy="token", dynamic=False)
    QuantizationArgs(strategy="token", dynamic=True)


def test_dynamic_strategies():
    with pytest.raises(ValueError):
        QuantizationArgs(strategy="channel", dynamic=True)
    with pytest.raises(ValueError):
        QuantizationArgs(strategy="group", group_size=16, dynamic="local")
    args = QuantizationArgs(strategy="tensor_group", group_size=16, dynamic="local")
    assert args.observer == "minmax"


def test_actorder_aliases():
    assert QuantizationArgs(group_size=8, actorder=True).actorder == \
        ActivationOrdering.GROUP
    assert QuantizationArgs(group_size=8, actorder="dynamic").actorder == \
        ActivationOrdering.GROUP
    assert QuantizationArgs(group_size=8, actorder="static").actorder == \
        ActivationOrdering.WEIGHT
    assert QuantizationArgs(actorder=False).actorder is None
    with pytest.raises(ValueError):
        QuantizationArgs(strategy="channel", group_size=-1, actorder="group")


def test_dynamic_observer_cleared():
    with pytest.warns(UserWarning):
        args = QuantizationArgs(strategy="token", dynamic=True, observer="minmax")
    assert args.observer is None


def test_zp_dtype_fp4():
    import ml_dtypes

    args = QuantizationArgs(num_bits=4, type="float", strategy="tensor_group",
                            group_size=16)
    assert np.dtype(args.zp_dtype) == np.dtype(ml_dtypes.float8_e4m3fn)


def test_serialization_roundtrip():
    args = QuantizationArgs(num_bits=4, group_size=128, symmetric=False)
    data = args.model_dump(mode="json")
    assert data["zp_dtype"] == "torch.int8"
    restored = QuantizationArgs.model_validate(data)
    assert restored == args

    # symmetric zp_dtype serializes as None (vLLM compat)
    sym = QuantizationArgs(num_bits=4, group_size=128, symmetric=True)
    assert sym.model_dump(mode="json")["zp_dtype"] is None


def test_storage_dtype():
    assert np.dtype(QuantizationArgs(num_bits=4).storage_dtype()) == np.int8
    assert np.dtype(QuantizationArgs(num_bits=8).storage_dtype()) == np.int8
    import ml_dtypes

    assert np.dtype(
        QuantizationArgs(num_bits=8, type="float").storage_dtype()
    ) == np.dtype(ml_dtypes.float8_e4m3fn)
