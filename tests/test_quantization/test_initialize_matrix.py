"""Qparam initialization shape matrix, ported from the reference's
tests/test_quantization/lifecycle/test_initialize.py: scale/zero-point/
g_idx/global-scale shapes for every strategy over a (8, 7)-weight Linear,
registered-parameter inventories, and the dynamic/local-dynamic gates."""

import math

import jax.numpy as jnp
import pytest

from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationScheme,
    QuantizationStatus,
)
from compressed_tensors_tpu.quantization.lifecycle import (
    initialize_module_for_quantization,
)

NUM_BITS = 8
OUT, IN = 8, 7  # Linear(7, 8): weight (8, 7)


@pytest.mark.parametrize(
    "weights,input_activations",
    [
        (QuantizationArgs(num_bits=NUM_BITS, symmetric=True), None),
        (None, QuantizationArgs(num_bits=NUM_BITS, symmetric=True)),
        (QuantizationArgs(num_bits=NUM_BITS, symmetric=True),
         QuantizationArgs(num_bits=NUM_BITS, symmetric=True)),
    ],
)
def test_initialize_module_for_quantization(weights, input_activations):
    """Registered qparam inventory per scheme
    (ref test_initialize_module_for_quantization:157). force_zero_point
    registers zero points even for symmetric schemes, like the reference's
    initialization default."""
    scheme = QuantizationScheme(targets=["*"], weights=weights,
                                input_activations=input_activations)
    state = initialize_module_for_quantization(scheme, (OUT, IN),
                                               force_zero_point=True)

    expected = set()
    if weights is not None:
        expected |= {"weight_scale", "weight_zero_point"}
    if input_activations is not None:
        expected |= {"input_scale", "input_zero_point"}
    assert set(state.qparams) == expected
    assert state.scheme is scheme
    assert state.status == QuantizationStatus.INITIALIZED


STRATEGY_MATRIX = [
    (QuantizationArgs(strategy="tensor"),
     QuantizationArgs(strategy="tensor")),
    (QuantizationArgs(strategy="channel"), None),
    (QuantizationArgs(strategy="group", group_size=2), None),
    (QuantizationArgs(strategy="group", group_size=2, actorder="group"),
     None),
    (QuantizationArgs(strategy="group", group_size=2, actorder="weight"),
     None),
    (QuantizationArgs(strategy="tensor_group", group_size=16, type="float",
                      num_bits=4), None),
    (QuantizationArgs(strategy="tensor_group", group_size=16, type="float",
                      num_bits=4),
     QuantizationArgs(strategy="tensor_group", group_size=16, type="float",
                      num_bits=4, dynamic="local")),
    (QuantizationArgs(strategy="block", block_structure=[2, 4]), None),
]


@pytest.mark.parametrize("weights,input_activations", STRATEGY_MATRIX)
def test_initialize_quantization_parameters(weights, input_activations):
    """Scale/zp/g_idx/global-scale shapes per strategy
    (ref test_initialize_quantization_parameters:283)."""
    scheme = QuantizationScheme(targets=["*"], weights=weights,
                                input_activations=input_activations)
    state = initialize_module_for_quantization(scheme, (OUT, IN),
                                               force_zero_point=True)

    for q_type, base in (("weights", "weight"),
                         ("input_activations", "input")):
        args = getattr(scheme, q_type)
        if args is None:
            continue

        if args.strategy == "tensor_group":
            gs = state.qparams.get(f"{base}_global_scale")
            assert gs is not None
            assert gs.dtype == jnp.float32
            assert gs.size == 1
        else:
            assert f"{base}_global_scale" not in state.qparams

        if args.strategy == "tensor":
            expected = (1,)
        elif args.strategy == "channel":
            expected = (OUT, 1)
        elif args.strategy in ("tensor_group", "group"):
            if base == "input":
                num_groups = math.ceil(IN / args.group_size)
                expected = (1, max(num_groups, 1))
            else:
                num_groups = math.ceil(IN / args.group_size)
                expected = (OUT, max(num_groups, 1))
        elif args.strategy == "block":
            bh, bw = args.block_structure
            expected = (math.ceil(OUT / bh), math.ceil(IN / bw))

        if args.dynamic is False:
            assert state.qparams[f"{base}_scale"].shape == expected, \
                (q_type, args.strategy)
            assert state.qparams[f"{base}_zero_point"].shape == expected
        elif args.dynamic == "local":
            # local-dynamic keeps only the global scale
            assert f"{base}_scale" not in state.qparams

        if args.actorder == "group":
            assert state.qparams[f"{base}_g_idx"].shape == (IN,)
        elif f"{base}_g_idx" in state.qparams:
            assert args.actorder == "group"


def test_dynamic_skips_all_qparams():
    """dynamic=True registers nothing (scales computed at runtime,
    ref initialize.py:182-196)."""
    scheme = QuantizationScheme(
        targets=["*"],
        input_activations=QuantizationArgs(strategy="token", dynamic=True),
    )
    state = initialize_module_for_quantization(scheme, (OUT, IN))
    assert "input_scale" not in state.qparams
    assert "input_zero_point" not in state.qparams


def test_symmetric_without_force_has_no_zero_point():
    """Symmetric schemes skip zero points unless forced
    (ref initialize.py:269)."""
    scheme = QuantizationScheme(
        targets=["*"],
        weights=QuantizationArgs(num_bits=4, symmetric=True,
                                 strategy="group", group_size=2),
    )
    state = initialize_module_for_quantization(scheme, (OUT, IN),
                                               force_zero_point=False)
    assert "weight_scale" in state.qparams
    assert "weight_zero_point" not in state.qparams


def test_block_activations_fall_back_to_tensor():
    """Block strategy on activations falls back to per-tensor scales (the
    activation shape is unknown at init, ref initialize.py:229-236)."""
    scheme = QuantizationScheme(
        targets=["*"],
        weights=QuantizationArgs(strategy="block", block_structure=[2, 4]),
        input_activations=QuantizationArgs(num_bits=8, strategy="tensor"),
    )
    state = initialize_module_for_quantization(scheme, (OUT, IN),
                                               force_zero_point=True)
    assert state.qparams["input_scale"].shape == (1,)
    bh, bw = 2, 4
    assert state.qparams["weight_scale"].shape == (
        math.ceil(OUT / bh), math.ceil(IN / bw))
