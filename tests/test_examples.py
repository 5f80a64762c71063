"""Example scripts execute end to end (the analogue of the reference's
tests/test_examples/, which runs its notebook/scripts in CI)."""

import subprocess
import sys

import pytest

REPO = "/root/repo"


def _run(args, timeout=420):
    result = subprocess.run(
        [sys.executable, *args], cwd=REPO, capture_output=True, text=True,
        timeout=timeout,
    )
    assert result.returncode == 0, result.stdout + result.stderr
    return result.stdout


def test_bit_packing_example():
    out = _run(["examples/bit_packing.py"])
    assert out.strip()


@pytest.mark.parametrize("preset", ["W4A16", "W8A8"])
def test_quantize_and_save_example(preset):
    out = _run(["examples/quantize_and_save.py", preset])
    assert out.strip()


def test_bitmask_compression_example():
    out = _run(["examples/bitmask_compression.py"])
    assert "round trips exact" in out


def test_serving_example():
    out = _run(["examples/serve_continuous_batching.py"])
    assert "prefix cache hits" in out


def _tiny_ct_checkpoint(tmp_path):
    import numpy as np

    from testing_utils import make_tiny_llama_checkpoint

    qconfig = {
        "config_groups": {
            "group_0": {
                "targets": ["Linear"],
                "weights": {"num_bits": 4, "type": "int",
                            "strategy": "group", "group_size": 32,
                            "symmetric": True},
            }
        },
        "format": "pack-quantized",
        "ignore": ["lm_head"],
        "quant_method": "compressed-tensors",
    }
    rng = np.random.default_rng(0)
    src, _ = make_tiny_llama_checkpoint(tmp_path, rng, qconfig)
    return src


def test_convert_ct_to_dense_example(tmp_path):
    src = _tiny_ct_checkpoint(tmp_path)
    dst = str(tmp_path / "dense")
    out = _run(["examples/convert_ct_to_dense.py", str(src), dst])
    assert "converted" in out
    import json
    import os

    with open(os.path.join(dst, "config.json")) as f:
        assert "quantization_config" not in json.load(f)


def test_convert_fp8_block_example(tmp_path):
    import json

    import ml_dtypes
    import numpy as np

    from compressed_tensors_tpu.utils.safetensors_io import save_safetensors

    rng = np.random.default_rng(0)
    src = tmp_path / "fp8src"
    src.mkdir()
    w = (rng.normal(size=(128, 128)) * 10).astype(ml_dtypes.float8_e4m3fn)
    save_safetensors(str(src / "model.safetensors"), {
        "model.layers.0.mlp.gate_proj.weight": w,
        "model.layers.0.mlp.gate_proj.weight_scale_inv":
            np.asarray([[0.5]], dtype=np.float32),
        "model.embed_tokens.weight":
            rng.normal(size=(8, 16)).astype(ml_dtypes.bfloat16),
    })
    (src / "config.json").write_text(json.dumps({
        "model_type": "llama",
        "quantization_config": {
            "quant_method": "fp8",
            "weight_block_size": [128, 128],
        },
    }))
    dst = str(tmp_path / "bf16")
    out = _run(["examples/convert_fp8_block_to_bf16.py", str(src), dst])
    assert "converted" in out
    from compressed_tensors_tpu.utils.safetensors_io import SafetensorsFile

    st = SafetensorsFile(str(tmp_path / "bf16" / "model.safetensors"))
    got = st.get("model.layers.0.mlp.gate_proj.weight")
    assert got.dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_allclose(
        got.astype(np.float32),
        (w.astype(np.float32) * 0.5).astype(ml_dtypes.bfloat16).astype(
            np.float32))


def test_convert_modelopt_nvfp4_example(tmp_path):
    import json

    import ml_dtypes
    import numpy as np

    from compressed_tensors_tpu.utils.safetensors_io import save_safetensors

    rng = np.random.default_rng(0)
    src = tmp_path / "mosrc"
    src.mkdir()
    tensors = {}
    for proj in ("q_proj", "k_proj", "v_proj"):
        base = f"model.layers.0.self_attn.{proj}"
        tensors[f"{base}.weight"] = rng.integers(
            0, 255, size=(8, 8)).astype(np.uint8)
        tensors[f"{base}.weight_scale"] = rng.random(
            (8, 1)).astype(ml_dtypes.float8_e4m3fn)
        tensors[f"{base}.weight_scale_2"] = np.asarray(
            [4.0], dtype=np.float32)
        tensors[f"{base}.input_scale"] = np.asarray(
            [2.0], dtype=np.float32)
    # ModelOpt serializes kv-cache scales onto the k/v projection modules
    tensors["model.layers.0.self_attn.k_proj.k_scale"] = np.asarray(
        [1.0], dtype=np.float32)
    tensors["model.layers.0.self_attn.v_proj.v_scale"] = np.asarray(
        [1.0], dtype=np.float32)
    save_safetensors(str(src / "model.safetensors"), tensors)
    (src / "config.json").write_text(json.dumps({
        "model_type": "llama",
        "quantization_config": {"quant_method": "modelopt"},
    }))
    dst = str(tmp_path / "ct")
    out = _run(["examples/convert_modelopt_nvfp4.py", str(src), dst])
    assert "converted" in out
    from compressed_tensors_tpu.utils.safetensors_io import SafetensorsFile

    st = SafetensorsFile(str(tmp_path / "ct" / "model.safetensors"))
    names = st.keys()
    assert "model.layers.0.self_attn.q_proj.weight_packed" in names
    assert "model.layers.0.self_attn.q_proj.weight_global_scale" in names
    import os

    with open(os.path.join(dst, "config.json")) as f:
        cfg = json.load(f)["quantization_config"]
    assert cfg["format"] == "nvfp4-pack-quantized"
    assert cfg.get("kv_cache_scheme") is not None
