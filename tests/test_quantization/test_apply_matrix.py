"""Config-application matrix, ported from the reference's
tests/test_quantization/lifecycle/test_apply.py: target prioritization
(exact > regex > class), scheme-resolution over a llama-shaped module
graph, unmatched-target warnings, config re-application, kv-cache and
attention-scheme application."""

import logging

import pytest

from compressed_tensors_tpu.compressors.model_compressor import (
    resolve_module_schemes,
)
from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationConfig,
    QuantizationScheme,
    QuantizationStatus,
)
from compressed_tensors_tpu.quantization.lifecycle import (
    apply_quantization_config as resolve_quant_states,
)
from compressed_tensors_tpu.utils.match import ModuleInfo, match_named_modules

LINEAR = ModuleInfo(type_name="Linear", parent_classes=("Module",))
ATTN = ModuleInfo(type_name="LlamaAttention", parent_classes=("Module",))
MOD = ModuleInfo(type_name="Module")


def llama_graph(layers=6) -> dict:
    g = {"model": MOD, "model.layers": MOD}
    for i in range(layers):
        p = f"model.layers.{i}"
        g[p] = MOD
        g[f"{p}.self_attn"] = ATTN
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            g[f"{p}.self_attn.{proj}"] = LINEAR
        g[f"{p}.mlp"] = MOD
        for proj in ("gate_proj", "up_proj", "down_proj"):
            g[f"{p}.mlp.{proj}"] = LINEAR
    g["lm_head"] = LINEAR
    return g


def _weight_shapes(graph):
    return {name: (8, 8) for name, info in graph.items()
            if info.type_name == "Linear"}


def test_target_prioritization():
    """exact layer name > regex > class/module name
    (ref test_target_prioritization:63)."""
    config = QuantizationConfig(**{
        "quant_method": "compressed-tensors",
        "format": "fakequant",
        "config_groups": {
            "group_1": {"weights": {"num_bits": 8}, "targets": ["Linear"]},
            "group_2": {"weights": {"num_bits": 4},
                        "targets": ["re:.*down_proj"]},
            "group_3": {"weights": {"num_bits": 2},
                        "targets": ["model.layers.0.mlp.down_proj"]},
        },
    })
    graph = llama_graph()
    schemes = resolve_module_schemes(graph, config)
    import re

    for name, info in graph.items():
        if info.type_name != "Linear":
            continue
        bits = schemes[name].weights.num_bits
        if name == "model.layers.0.mlp.down_proj":
            assert bits == 2, name
        elif re.match(".*down_proj", name):
            assert bits == 4, name
        else:
            assert bits == 8, name


@pytest.mark.parametrize(
    "target,should_raise_warning",
    [(("Linear",), False), (("Linear", "re:.*foobarbaz"), True)],
)
def test_apply_quantization_config_warns(caplog, target,
                                         should_raise_warning):
    """Unmatched targets warn; matched ones don't
    (ref test_apply_quantization_config:321)."""
    config = QuantizationConfig(**{
        "quant_method": "compressed-tensors",
        "format": "pack-quantized",
        "config_groups": {
            "group_1": {
                "weights": {"num_bits": 4, "type": "int",
                            "symmetric": False, "strategy": "tensor"},
                "targets": list(target),
            }
        },
        "ignore": ["lm_head", "re:.*gate"],
    })
    graph = llama_graph()
    with caplog.at_level(logging.WARNING,
                         logger="compressed_tensors_tpu.utils.match"):
        list(match_named_modules(
            graph, [t for s in config.config_groups.values()
                    for t in s.targets],
            config.ignore, warn_on_fail=True))
    if should_raise_warning:
        assert "foobarbaz" in caplog.text
    else:
        assert caplog.text == ""


def test_multi_apply_quantization_config():
    """Re-applying a config replaces the scheme on re-matched modules and
    keeps prior schemes elsewhere (ref test_multi_apply:356)."""
    graph = llama_graph()
    fp8 = QuantizationScheme(
        targets=[r"re:.*self_attn\.(k|q|o|v)_proj$"],
        weights=QuantizationArgs(num_bits=8, type="float",
                                 strategy="tensor", symmetric=True),
        input_activations=QuantizationArgs(num_bits=8, type="float",
                                           strategy="tensor",
                                           symmetric=True),
    )
    w4_asym = QuantizationScheme(
        targets=[r"re:.*mlp\.(down|gate|up)_proj$",
                 r"re:.*self_attn\.o_proj$"],
        weights=QuantizationArgs(num_bits=4, type="int", strategy="group",
                                 group_size=8, symmetric=False),
    )
    s1 = resolve_module_schemes(
        graph, QuantizationConfig(config_groups={"group_0": fp8},
                                  ignore=["lm_head"]))
    s2 = resolve_module_schemes(
        graph, QuantizationConfig(config_groups={"group_0": w4_asym},
                                  ignore=["lm_head"]))
    merged = {**s1, **s2}
    # o_proj re-matched: overwritten by the second config
    assert merged["model.layers.0.self_attn.o_proj"].weights.num_bits == 4
    assert not merged["model.layers.0.self_attn.o_proj"].weights.symmetric
    # q_proj only in the first config: scheme preserved
    assert merged["model.layers.0.self_attn.q_proj"].weights.num_bits == 8
    assert merged["model.layers.0.self_attn.q_proj"].weights.type == "float"
    # mlp from the second config
    assert merged["model.layers.0.mlp.down_proj"].weights.num_bits == 4


def test_apply_kv_cache():
    """kv_cache_scheme creates k/v scales on attention modules
    (ref test_apply_kv_cache:453)."""
    graph = llama_graph(layers=2)
    config = QuantizationConfig(
        config_groups={},
        kv_cache_scheme=QuantizationArgs(num_bits=8, type="float",
                                         strategy="tensor", symmetric=True),
    )
    states = resolve_quant_states(graph, _weight_shapes(graph), config)
    for i in range(2):
        st = states[f"model.layers.{i}.self_attn"]
        assert "k_scale" in st.qparams and "v_scale" in st.qparams
        assert st.qparams["k_scale"].shape == (1,)
    # non-attention modules don't get kv scales
    assert "model.layers.0.mlp.down_proj" not in states or \
        "k_scale" not in states["model.layers.0.mlp.down_proj"].qparams


def test_apply_kv_cache_skips_non_cache_attention():
    """Modules not matching the kv-cache targets regex get no scales.

    The reference additionally skips attention modules whose forward lacks
    a `past_key_value` kwarg (torch signature introspection, ref
    test_apply.py:473); a module graph carries no signatures, so this
    engine's contract is purely the KV_CACHE_TARGETS name regex
    (`re:.*(self_attn|attention)$`) — callers exclude cache-less attention
    via the `kv_module_names` override instead."""
    graph = {
        "text_attention": ATTN,      # ends in "attention": matches regex
        "vision_proj": ATTN,         # no attention-ish suffix: no match
        "model.layers.0.self_attn": ATTN,
    }
    config = QuantizationConfig(
        config_groups={},
        kv_cache_scheme=QuantizationArgs(num_bits=8, type="float",
                                         strategy="tensor", symmetric=True),
    )
    states = resolve_quant_states(graph, {}, config)
    assert "model.layers.0.self_attn" in states
    assert "text_attention" in states
    assert "vision_proj" not in states
    # the explicit override is the cache-capability filter here
    states = resolve_quant_states(graph, {}, config,
                                  kv_module_names=["model.layers.0.self_attn"])
    assert "text_attention" not in states


def test_apply_attention_scheme():
    """An attention-targeted scheme reaches attention modules by class and
    carries input_activations only (ref test_apply_attention:535)."""
    from compressed_tensors_tpu.modeling import (
        initialize_hooked_attention,
        validate_attention_scheme,
    )

    graph = llama_graph(layers=2)
    scheme = QuantizationScheme(
        targets=["LlamaAttention"],
        input_activations=QuantizationArgs(num_bits=8, type="float",
                                           strategy="tensor"),
    )
    validate_attention_scheme(scheme)
    matched = [n for n, _ in match_named_modules(graph, scheme.targets)]
    assert matched == ["model.layers.0.self_attn",
                       "model.layers.1.self_attn"]
    state = initialize_hooked_attention(scheme.input_activations,
                                        quantize_query=True)
    assert state.q_scale is not None
    assert state.k_scale is not None
    assert state.v_scale is not None


LINEAR_SCHEME = QuantizationScheme(targets=["Linear"])
ATTENTION_SCHEME = QuantizationScheme(
    targets=["LlamaAttention"],
    input_activations=QuantizationArgs(num_bits=8, type="float",
                                       strategy="tensor"),
)
ATTENTION_LINEARS = QuantizationScheme(targets=[r"re:.*self_attn\..*"])
MLP_LINEARS = QuantizationScheme(targets=[r"re:.*mlp\..*"])
DOWN_PROJ_SCHEME = QuantizationScheme(targets=["re:.*down_proj"])

ALL_LINEARS = (
    [f"model.layers.{i}.self_attn.{k}_proj" for i in range(6) for k in "qkvo"]
    + [f"model.layers.{i}.mlp.{k}_proj" for i in range(6)
       for k in ("gate", "up", "down")]
    + ["lm_head"]
)


@pytest.mark.parametrize(
    "config, expected",
    [
        (QuantizationConfig(config_groups={"group_0": LINEAR_SCHEME}),
         {p: LINEAR_SCHEME for p in ALL_LINEARS}),
        (QuantizationConfig(config_groups={"group_0": ATTENTION_SCHEME}),
         {f"model.layers.{i}.self_attn": ATTENTION_SCHEME
          for i in range(6)}),
        (QuantizationConfig(config_groups={"attention": ATTENTION_SCHEME,
                                           "linear": LINEAR_SCHEME}),
         {**{f"model.layers.{i}.self_attn": ATTENTION_SCHEME
             for i in range(6)},
          **{p: LINEAR_SCHEME for p in ALL_LINEARS}}),
        (QuantizationConfig(config_groups={"group_0": DOWN_PROJ_SCHEME}),
         {f"model.layers.{i}.mlp.down_proj": DOWN_PROJ_SCHEME
          for i in range(6)}),
        (QuantizationConfig(config_groups={
            "attention_linears": ATTENTION_LINEARS,
            "mlp_linears": MLP_LINEARS}),
         {**{f"model.layers.{i}.self_attn.{k}_proj": ATTENTION_LINEARS
             for i in range(6) for k in "qkvo"},
          **{f"model.layers.{i}.mlp.{k}_proj": MLP_LINEARS
             for i in range(6) for k in ("gate", "up", "down")}}),
    ],
    ids=["all_linears", "only_attention", "linear_and_attention",
         "only_down_proj", "attention_and_mlp_groups"],
)
def test_apply_model_schemes(config, expected):
    """Scheme resolution over a 6-layer llama graph matches the reference's
    expected per-module schemes (ref test_apply_model:646)."""
    schemes = resolve_module_schemes(llama_graph(), config)
    assert schemes == expected


def test_status_lifecycle_ordering():
    """Status enum ordering drives lifecycle gates (ref quant_config)."""
    order = [QuantizationStatus.INITIALIZED, QuantizationStatus.CALIBRATION,
             QuantizationStatus.FROZEN, QuantizationStatus.COMPRESSED]
    for earlier, later in zip(order, order[1:]):
        assert earlier < later
        assert later >= earlier
