"""ModelCompressor orchestration corpus, ported from the reference's
tests/test_compressors/model_compressors/test_model_compressor.py:
compress skips unmatched modules, round trips, update_config file
semantics (create, preserve, transform_config embedding, no-op, version),
format inference from schemes, empty-model edge cases."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

import compressed_tensors_tpu
from compressed_tensors_tpu.compressors import (
    ModelCompressor,
    module_graph_from_names,
)
from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.ops import calculate_qparams
from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationConfig,
    QuantizationScheme,
    QuantizationStatus,
)
from compressed_tensors_tpu.transform import TransformConfig


def _quant_config(bits=4, strategy="channel", fmt="pack-quantized"):
    return QuantizationConfig(
        config_groups={"group_0": QuantizationScheme(
            targets=["Linear"],
            weights=QuantizationArgs(num_bits=bits, type="int",
                                     strategy=strategy, symmetric=True))},
        format=fmt,
    )


def _state(rng, shape, args):
    w = rng.standard_normal(shape).astype(np.float32) * 0.05
    mn = w.min(-1, keepdims=True) if args.strategy == "channel" else w.min()
    mx = w.max(-1, keepdims=True) if args.strategy == "channel" else w.max()
    scale, _ = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)
    return {"weight": jnp.asarray(w), "weight_scale": scale}


def test_compress_model_basic(rng):
    """Compression replaces the dense weight of matched modules with the
    packed representation (ref test_compress_model_basic:102)."""
    config = _quant_config()
    mc = ModelCompressor(quantization_config=config)
    modules = module_graph_from_names(["linear"])
    args = config.config_groups["group_0"].weights
    out = mc.compress_state({"linear": _state(rng, (32, 64), args)}, modules)
    assert "weight_packed" in out["linear"]
    assert "weight" not in out["linear"]
    assert mc.quantization_config.quantization_status == \
        QuantizationStatus.COMPRESSED


def test_compress_model_skips_non_quantized_modules(rng):
    """Modules outside the targets/ignore match keep their dense weight
    (ref test_compress_model_skips_non_quantized_modules:129)."""
    config = _quant_config()
    config.ignore = ["skipme"]
    mc = ModelCompressor(quantization_config=config)
    modules = module_graph_from_names(["linear", "skipme"])
    args = config.config_groups["group_0"].weights
    states = {"linear": _state(rng, (32, 64), args),
              "skipme": {"weight": jnp.asarray(
                  rng.standard_normal((8, 8)).astype(np.float32))}}
    out = mc.compress_state(states, modules)
    assert "weight_packed" in out["linear"]
    assert set(out["skipme"]) == {"weight"}


def test_update_config_creates_file(tmp_path):
    mc = ModelCompressor(quantization_config=_quant_config())
    mc.update_config(str(tmp_path))
    path = tmp_path / "config.json"
    assert path.exists()
    data = json.loads(path.read_text())
    assert data["quantization_config"]["quant_method"] == \
        "compressed-tensors"


def test_update_config_preserves_existing_data(tmp_path):
    (tmp_path / "config.json").write_text(
        json.dumps({"model_type": "test", "hidden_size": 768}))
    mc = ModelCompressor(quantization_config=_quant_config())
    mc.update_config(str(tmp_path))
    data = json.loads((tmp_path / "config.json").read_text())
    assert data["model_type"] == "test"
    assert data["hidden_size"] == 768
    assert "quantization_config" in data


def test_update_config_with_transform_config(tmp_path):
    t_config = TransformConfig(config_groups={"group_0": {
        "type": "hadamard",
        "apply": [{"targets": ["Linear"], "location": "weight_input"}],
    }})
    mc = ModelCompressor(quantization_config=_quant_config(),
                         transform_config=t_config)
    mc.update_config(str(tmp_path))
    data = json.loads((tmp_path / "config.json").read_text())
    assert "transform_config" in data["quantization_config"]


def test_update_config_no_configs(tmp_path):
    mc = ModelCompressor()
    mc.update_config(str(tmp_path))
    assert not (tmp_path / "config.json").exists()


def test_update_config_includes_version(tmp_path):
    mc = ModelCompressor(quantization_config=_quant_config())
    mc.update_config(str(tmp_path))
    qc = json.loads((tmp_path / "config.json").read_text())[
        "quantization_config"]
    assert "version" in qc
    assert qc["version"] == compressed_tensors_tpu.__version__


def test_from_schemes_infers_format(rng):
    """Config reconstruction from attached schemes plus format inference
    yields pack-quantized for a 4-bit channel scheme (ref
    test_compress_model_updates_format_in_config:211)."""
    from compressed_tensors_tpu.compressors.format import (
        infer_format_from_schemes,
    )

    scheme = QuantizationScheme(
        targets=["Linear"],
        weights=QuantizationArgs(num_bits=4, type="int", strategy="channel",
                                 symmetric=True))
    fmt = infer_format_from_schemes([("Linear", scheme)])
    config = QuantizationConfig.from_schemes([scheme], format=fmt.value)
    assert CompressionFormat(config.format) == \
        CompressionFormat.pack_quantized
    assert config.config_groups["group_0"] is scheme


def test_empty_model(rng):
    """Compressing an empty module set is a no-op
    (ref test_empty_model:366)."""
    mc = ModelCompressor(quantization_config=_quant_config())
    assert mc.compress_state({}, {}) == {}


def test_model_with_no_quantization_scheme(rng):
    """No quantization config at all: states pass through untouched
    (ref test_model_with_no_quantization_scheme:376)."""
    mc = ModelCompressor()
    modules = module_graph_from_names(["linear"])
    w = rng.standard_normal((8, 8)).astype(np.float32)
    out = mc.compress_state({"linear": {"weight": jnp.asarray(w)}}, modules)
    np.testing.assert_array_equal(np.asarray(out["linear"]["weight"]), w)
