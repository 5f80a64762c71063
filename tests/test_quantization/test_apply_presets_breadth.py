"""Preset x apply breadth: every PRESET_SCHEME applies over a llama-shaped
module graph, initializes the right qparam inventory/shapes, and survives
the from_module_states config reconstruction — the parameter breadth of
the reference's tests/test_quantization/lifecycle/test_apply.py matrix
plus tests/test_configs/test_bit_depths.py."""

import math

import pytest

from compressed_tensors_tpu.quantization import (
    PRESET_SCHEMES,
    QuantizationConfig,
    QuantizationStatus,
    preset_name_to_scheme,
)
from compressed_tensors_tpu.quantization.lifecycle import (
    apply_quantization_config,
)
from compressed_tensors_tpu.utils.match import ModuleInfo

LINEAR = ModuleInfo(type_name="Linear", parent_classes=("Module",))
MOD = ModuleInfo(type_name="Module")

PRESETS = sorted(p for p in PRESET_SCHEMES if p != "UNQUANTIZED")


def graph_and_shapes(layers=2):
    g = {"model": MOD}
    shapes = {}
    for i in range(layers):
        p = f"model.layers.{i}"
        g[p] = MOD
        for proj in ("q_proj", "o_proj"):
            g[f"{p}.{proj}"] = LINEAR
            shapes[f"{p}.{proj}"] = (256, 256)
    g["lm_head"] = LINEAR
    shapes["lm_head"] = (512, 256)
    return g, shapes


def _config(preset, ignore=("lm_head",), status=None):
    scheme = preset_name_to_scheme(preset, ["Linear"])
    return QuantizationConfig(
        config_groups={"group_0": scheme},
        ignore=list(ignore),
        quantization_status=(status
                             or QuantizationStatus.INITIALIZED.value),
    )


@pytest.mark.parametrize("preset", PRESETS)
def test_preset_applies_and_initializes(preset):
    graph, shapes = graph_and_shapes()
    states = apply_quantization_config(graph, shapes, _config(preset))

    targeted = [n for n in shapes if n != "lm_head"]
    for name in targeted:
        assert name in states, name
        st = states[name]
        args = st.scheme.weights
        if args is None:
            continue
        scale = st.qparams.get("weight_scale")
        if args.dynamic is True:
            assert scale is None
            continue
        assert scale is not None
        n, k = shapes[name]
        if args.strategy == "tensor":
            assert scale.size == 1
        elif args.strategy == "channel":
            assert scale.shape[0] == n
        elif args.strategy in ("group", "tensor_group"):
            assert scale.shape[-1] == math.ceil(k / args.group_size)
        elif args.strategy == "block":
            bh, bw = args.block_structure
            assert scale.shape == (math.ceil(n / bh), math.ceil(k / bw))
        if args.strategy == "tensor_group":
            assert "weight_global_scale" in st.qparams
    assert "lm_head" not in states


@pytest.mark.parametrize("preset", PRESETS)
def test_preset_reconstruction_roundtrip(preset):
    """from_module_states recovers the preset scheme (the save path's
    config regeneration, ref quant_config.py:185-289)."""
    graph, shapes = graph_and_shapes()
    config = _config(preset)
    states = apply_quantization_config(graph, shapes, config)
    rebuilt = QuantizationConfig.from_module_states(graph, states)
    (scheme,) = rebuilt.config_groups.values()
    want = preset_name_to_scheme(preset, ["Linear"])
    assert scheme.weights == want.weights
    assert scheme.input_activations == want.input_activations
    assert "lm_head" in rebuilt.ignore


@pytest.mark.parametrize("preset", ["W4A16", "W8A8", "FP8_DYNAMIC",
                                    "NVFP4", "MXFP4"])
def test_preset_status_walk(preset):
    """Status lifecycle ordering holds for every preset family on apply
    (initialized -> frozen re-application keeps schemes stable)."""
    graph, shapes = graph_and_shapes()
    st_init = apply_quantization_config(graph, shapes, _config(preset))
    cfg = _config(preset, status=QuantizationStatus.FROZEN)
    st_frozen = apply_quantization_config(graph, shapes, cfg)
    assert set(st_init) == set(st_frozen)
    for name in st_init:
        assert st_init[name].scheme.weights == st_frozen[name].scheme.weights
        assert st_frozen[name].status == QuantizationStatus.FROZEN
