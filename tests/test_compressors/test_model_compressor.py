"""ModelCompressor end-to-end: scheme resolution, compress/decompress of a
tiny model, sharded checkpoint save/load, config.json round trip (mirrors
reference tests/test_compressors/model_compressors/)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.compressors import (
    ModelCompressor,
    module_graph_from_names,
)
from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.ops import calculate_qparams
from compressed_tensors_tpu.quantization import (
    QuantizationConfig,
    QuantizationStatus,
)


def _tiny_model_states(rng, hidden=64, n_layers=2):
    """Llama-shaped module states with group-128-compatible dims."""
    names, states = [], {}
    names.append("model.embed_tokens")
    states["model.embed_tokens"] = {
        "weight": jnp.asarray(rng.normal(size=(128, hidden)).astype(np.float32))
    }
    for i in range(n_layers):
        for proj in ("self_attn.q_proj", "self_attn.k_proj", "mlp.gate_proj"):
            name = f"model.layers.{i}.{proj}"
            names.append(name)
            states[name] = {
                "weight": jnp.asarray(
                    rng.normal(size=(hidden, hidden)).astype(np.float32)
                )
            }
    names.append("lm_head")
    states["lm_head"] = {
        "weight": jnp.asarray(rng.normal(size=(128, hidden)).astype(np.float32))
    }
    return names, states


def _with_qparams(states, config, modules):
    """Attach group/channel scales like a calibration pass would."""
    from compressed_tensors_tpu.compressors.model_compressor import (
        resolve_module_schemes,
    )

    schemes = resolve_module_schemes(modules, config)
    for name, scheme in schemes.items():
        w = np.asarray(states[name]["weight"], dtype=np.float32)
        args = scheme.weights
        if args.strategy == "group":
            g = w.reshape(w.shape[0], -1, args.group_size)
            mn, mx = g.min(-1), g.max(-1)
        elif args.strategy == "channel":
            mn = w.min(-1, keepdims=True)
            mx = w.max(-1, keepdims=True)
        else:
            mn, mx = w.min(), w.max()
        scale, zp = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)
        states[name]["weight_scale"] = scale
        if not args.symmetric:
            states[name]["weight_zero_point"] = zp
    return states, schemes


W4A16_CONFIG = {
    "config_groups": {
        "group_0": {
            "targets": ["Linear"],
            "weights": {"num_bits": 4, "type": "int", "strategy": "group",
                        "group_size": 32, "symmetric": True},
        }
    },
    "format": "pack-quantized",
    "ignore": ["lm_head"],
    "quant_method": "compressed-tensors",
}


def test_scheme_resolution(rng):
    names, states = _tiny_model_states(rng)
    modules = module_graph_from_names(names)
    mc = ModelCompressor.from_compression_config(W4A16_CONFIG)
    schemes = mc.resolve_schemes(modules)
    assert "lm_head" not in schemes  # ignored
    assert "model.embed_tokens" not in schemes  # not Linear
    assert "model.layers.0.self_attn.q_proj" in schemes
    assert len(schemes) == 6


def test_compress_decompress_roundtrip(rng):
    names, states = _tiny_model_states(rng)
    modules = module_graph_from_names(names)
    mc = ModelCompressor.from_compression_config(W4A16_CONFIG)
    states, schemes = _with_qparams(states, mc.quantization_config, modules)

    compressed = mc.compress_state(states, modules)
    assert mc.quantization_config.quantization_status == \
        QuantizationStatus.COMPRESSED
    q = compressed["model.layers.0.self_attn.q_proj"]
    assert "weight_packed" in q and q["weight_packed"].dtype == jnp.int32
    # unmatched modules pass through
    assert "weight" in compressed["lm_head"]
    assert "weight" in compressed["model.embed_tokens"]

    decompressed = mc.decompress_state(compressed, modules)
    dq = decompressed["model.layers.0.self_attn.q_proj"]
    assert "weight" in dq and dq["weight"].shape == (64, 64)

    # second compress of the decompressed state gives identical packed bits
    mc2 = ModelCompressor.from_compression_config(W4A16_CONFIG)
    recompressed = mc2.compress_state(decompressed, modules)
    np.testing.assert_array_equal(
        np.asarray(recompressed["model.layers.0.self_attn.q_proj"]
                   ["weight_packed"]),
        np.asarray(q["weight_packed"]),
    )


def test_checkpoint_save_load(rng, tmp_path):
    names, states = _tiny_model_states(rng)
    modules = module_graph_from_names(names)
    mc = ModelCompressor.from_compression_config(W4A16_CONFIG)
    states, _ = _with_qparams(states, mc.quantization_config, modules)
    original_weight = np.asarray(states["model.layers.0.mlp.gate_proj"]["weight"])

    save_dir = str(tmp_path / "ckpt")
    mc.save_checkpoint(save_dir, states, modules)

    assert os.path.exists(os.path.join(save_dir, "model.safetensors"))
    with open(os.path.join(save_dir, "config.json")) as f:
        config = json.load(f)
    qc = config["quantization_config"]
    assert qc["quant_method"] == "compressed-tensors"
    assert qc["quantization_status"] == "compressed"
    assert "version" in qc

    # load back run-compressed
    mc2 = ModelCompressor.from_pretrained(save_dir)
    assert mc2 is not None
    loaded, schemes = mc2.load_checkpoint(save_dir, run_compressed=True)
    assert "weight_packed" in loaded["model.layers.0.mlp.gate_proj"]
    assert schemes["model.layers.0.mlp.gate_proj"].weights.num_bits == 4

    # load decompressed: dense weight matches fake-quantized original
    mc3 = ModelCompressor.from_pretrained(save_dir)
    dense, _ = mc3.load_checkpoint(save_dir, run_compressed=False)
    w = np.asarray(dense["model.layers.0.mlp.gate_proj"]["weight"])
    assert w.shape == original_weight.shape
    from compressed_tensors_tpu.ops import fake_quantize

    fq = fake_quantize(
        jnp.asarray(original_weight),
        states["model.layers.0.mlp.gate_proj"]["weight_scale"],
        None,
        mc.quantization_config.config_groups["group_0"].weights,
    )
    np.testing.assert_allclose(w, np.asarray(fq), atol=1e-5)


def test_sparse24_stacked_with_quant(rng):
    """BASELINE config 4: 2:4 sparse-24-bitmask stacked over INT quant."""
    config = {
        "config_groups": {
            "group_0": {
                "targets": ["Linear"],
                "weights": {"num_bits": 8, "type": "int",
                            "strategy": "channel", "symmetric": True},
            }
        },
        "format": "naive-quantized",
        "sparsity_config": {
            "format": "sparse-24-bitmask",
            "targets": ["Linear"],
            "sparsity_structure": "2:4",
        },
        "quant_method": "compressed-tensors",
    }
    mc = ModelCompressor.from_compression_config(config)
    assert mc.sparsity_config is not None

    from compressed_tensors_tpu.ops.bitmask import get_24_bytemasks

    names = ["layer.proj"]
    w = rng.normal(size=(16, 32)).astype(np.float32)
    w = w * np.asarray(get_24_bytemasks(jnp.asarray(w)))  # make 2:4 sparse
    modules = module_graph_from_names(names)
    states = {"layer.proj": {"weight": jnp.asarray(w)}}
    states, _ = _with_qparams(states, mc.quantization_config, modules)

    compressed = mc.compress_state(states, modules)
    st = compressed["layer.proj"]
    assert "weight.compressed" in st and "weight.bitmask" in st
    assert st["weight.compressed"].dtype == jnp.int8
    assert st["weight.compressed"].shape == (16, 16)

    decompressed = mc.decompress_state(compressed, modules)
    dw = np.asarray(decompressed["layer.proj"]["weight"])
    assert dw.shape == (16, 32)
    # zeros stay zero
    assert (dw[w == 0] == 0).all()
