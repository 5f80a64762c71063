"""Apply -> reconstruct round-trip corpus, ported from the reference's
tests/test_quantization/lifecycle/test_apply.py:112-330
(test_apply_quantization_config_tinyllama / test_from_pretrained /
test_serialize_config_tinyllama): applying a config to a llama-shaped
module graph produces the expected per-module quantization state, and
reconstructing a config from those states recovers the original schemes,
kv-cache scheme, and a consolidated ignore list.
"""

import numpy as np
import pytest

from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationConfig,
    QuantizationScheme,
    QuantizationStatus,
)
from compressed_tensors_tpu.quantization.lifecycle import (
    apply_quantization_config,
)
from compressed_tensors_tpu.utils.match import ModuleInfo

LINEAR = ModuleInfo(type_name="Linear", parent_classes=("Module",))
EMBEDDING = ModuleInfo(type_name="Embedding", parent_classes=("Module",))
ATTN = ModuleInfo(type_name="LlamaAttention", parent_classes=("Module",))
ROPE = ModuleInfo(type_name="LlamaRotaryEmbedding",
                  parent_classes=("Module",))
MOD = ModuleInfo(type_name="Module")


def tinyllama_graph(layers=3):
    g = {"model": MOD, "model.embed_tokens": EMBEDDING, "model.layers": MOD}
    shapes = {"model.embed_tokens": (256, 64)}
    for i in range(layers):
        p = f"model.layers.{i}"
        g[p] = MOD
        g[f"{p}.self_attn"] = ATTN
        g[f"{p}.self_attn.rotary_emb"] = ROPE
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            g[f"{p}.self_attn.{proj}"] = LINEAR
            shapes[f"{p}.self_attn.{proj}"] = (64, 64)
        g[f"{p}.mlp"] = MOD
        for proj in ("gate_proj", "up_proj", "down_proj"):
            g[f"{p}.mlp.{proj}"] = LINEAR
            shapes[f"{p}.mlp.{proj}"] = (128, 64)
    g["lm_head"] = LINEAR
    shapes["lm_head"] = (256, 64)
    return g, shapes


def sample_tinyllama_config(status="frozen"):
    """The reference's sample tinyllama config (test_apply.py:276-311)."""
    return QuantizationConfig.model_validate({
        "quant_method": "compressed-tensors",
        "format": "fakequant",
        "quantization_status": status,
        "global_compression_ratio": None,
        "config_groups": {
            "group_1": {
                "weights": {"num_bits": 8, "type": "int", "symmetric": True,
                            "strategy": "tensor"},
                "input_activations": {"num_bits": 8, "type": "int",
                                      "symmetric": True,
                                      "strategy": "tensor"},
                "targets": ["Linear"],
            },
            "group_2": {
                "weights": {"num_bits": 8, "type": "int",
                            "symmetric": False, "strategy": "tensor"},
                "input_activations": None,
                "targets": ["Embedding"],
            },
        },
        "ignore": ["LlamaRotaryEmbedding", "model.layers.1.mlp.down_proj"],
    })


def test_apply_quantization_config_tinyllama():
    """Every matched module carries exactly the qparams its scheme implies
    (ref test_apply_quantization_config_tinyllama:112)."""
    graph, shapes = tinyllama_graph()
    config = sample_tinyllama_config(status="initialized")
    states = apply_quantization_config(graph, shapes, config)

    # ignored module has no state; all other Linears + the Embedding do
    assert "model.layers.1.mlp.down_proj" not in states
    for name, info in graph.items():
        if name == "model.layers.1.mlp.down_proj":
            continue
        if info.type_name == "Linear":
            st = states[name]
            assert "weight_scale" in st.qparams
            assert "input_scale" in st.qparams
            assert st.status == QuantizationStatus.INITIALIZED
        elif info.type_name == "Embedding":
            st = states[name]
            assert "weight_scale" in st.qparams
            assert "weight_zero_point" in st.qparams  # asymmetric
            assert "input_scale" not in st.qparams
        else:
            assert name not in states


@pytest.mark.parametrize("config", [
    # linear acts only
    QuantizationConfig(config_groups={"linear": QuantizationScheme(
        targets=["Linear"],
        input_activations=QuantizationArgs(num_bits=8, type="float",
                                           strategy="tensor"),
    )}),
    # with explicit ignores
    QuantizationConfig(
        config_groups={"linear": QuantizationScheme(
            targets=["Linear"],
            input_activations=QuantizationArgs(num_bits=8, type="float",
                                               strategy="tensor"),
        )},
        ignore=["model.layers.0.self_attn.q_proj",
                "model.layers.1.self_attn.k_proj",
                "model.layers.2.self_attn.v_proj"],
    ),
    # kv-cache only
    QuantizationConfig(
        config_groups={},
        kv_cache_scheme=QuantizationArgs(num_bits=8, type="float",
                                         strategy="tensor"),
    ),
])
def test_from_module_states_roundtrip(config):
    """apply then reconstruct recovers schemes + kv scheme + ignores
    (ref test_from_pretrained:207)."""
    graph, shapes = tinyllama_graph()
    states = apply_quantization_config(graph, shapes, config)
    rebuilt = QuantizationConfig.from_module_states(graph, states)

    assert (list(rebuilt.config_groups.values())
            == list(config.config_groups.values()))
    assert rebuilt.kv_cache_scheme == config.kv_cache_scheme
    # the rebuilt ignore list consolidates every unquantized quantizable
    # module; the original explicit ignores must be a subset of it
    for ign in (config.ignore or []):
        assert ign in rebuilt.ignore
    if config.config_groups:
        # embed/lm_head were never targeted -> consolidated into ignore
        assert "model.embed_tokens" in rebuilt.ignore


def test_serialize_config_tinyllama():
    """Reconstruction groups by unique scheme, keeps target lists, infers
    the dense format, and consolidates the ignore list
    (ref test_serialize_config_tinyllama:216)."""
    graph, shapes = tinyllama_graph()
    config = sample_tinyllama_config()
    states = apply_quantization_config(graph, shapes, config)
    rebuilt = QuantizationConfig.from_module_states(graph, states)

    assert len(rebuilt.config_groups) == 2
    groups = list(rebuilt.config_groups.values())
    targets = sorted(tuple(g.targets) for g in groups)
    assert targets == [("Embedding",), ("Linear",)]
    lin = next(g for g in groups if g.targets == ["Linear"])
    emb = next(g for g in groups if g.targets == ["Embedding"])
    assert lin.input_activations is not None
    assert emb.input_activations is None
    assert rebuilt.format == CompressionFormat.dense.value
    assert rebuilt.quant_method == "compressed-tensors"
    assert rebuilt.ignore == ["model.layers.1.mlp.down_proj"]


def test_from_module_states_status_propagates():
    graph, shapes = tinyllama_graph()
    config = sample_tinyllama_config(status="frozen")
    states = apply_quantization_config(graph, shapes, config)
    rebuilt = QuantizationConfig.from_module_states(graph, states)
    assert rebuilt.quantization_status == QuantizationStatus.FROZEN


def test_from_module_states_empty():
    graph, shapes = tinyllama_graph()
    rebuilt = QuantizationConfig.from_module_states(graph, {})
    assert rebuilt is None
