"""Converter tests: AWQ nibble-order round trip, CT dequantizer, ModelOpt
renames, FP8-block dequant, streaming convert_checkpoint end-to-end
(mirrors reference tests/test_entrypoints/)."""

import json
import os
import sys
from pathlib import Path

import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "_stubs"))

from compressed_tensors_tpu.entrypoints.convert import (  # noqa: E402
    AutoAWQConverter,
    CompressedTensorsDequantizer,
    FP8BlockDequantizer,
    ModelOptNvfp4Converter,
    convert_checkpoint,
)
from compressed_tensors_tpu.ops.pack import unpack_from_int32  # noqa: E402
from compressed_tensors_tpu.utils.safetensors_io import (  # noqa: E402
    SafetensorsFile,
    save_safetensors,
)

# inverse of AWQ_REVERSE_ORDER: position i of a packed int32 holds
# original element AWQ_PACK_ORDER[i]
AWQ_PACK_ORDER = np.argsort(AutoAWQConverter.AWQ_REVERSE_ORDER)


def awq_pack(values_u4: np.ndarray) -> np.ndarray:
    """Pack unsigned 4-bit values (R, C) into AWQ GEMM int32 (R, C/8)."""
    r, c = values_u4.shape
    v = values_u4.reshape(r, c // 8, 8)[:, :, AWQ_PACK_ORDER].astype(np.uint32)
    shifts = (4 * np.arange(8, dtype=np.uint32))[None, None, :]
    words = (v << shifts).sum(axis=-1, dtype=np.uint32)
    return words.view(np.int32)


def test_awq_unpack_reverse_roundtrip(rng):
    orig = rng.integers(0, 16, size=(4, 64)).astype(np.int64)
    packed = awq_pack(orig)
    iw, _ = AutoAWQConverter.unpack_awq(packed, None, 4)
    iw, _ = AutoAWQConverter.reverse_awq_order(iw, None, 4)
    np.testing.assert_array_equal(iw & 0xF, orig)


def test_awq_conversion_produces_ct_packed(rng):
    K, N, G = 64, 32, 32
    orig_u4 = rng.integers(0, 16, size=(K, N)).astype(np.int64)
    zeros_u4 = rng.integers(0, 16, size=(K // G, N)).astype(np.int64)
    scales = rng.random((K // G, N)).astype(np.float32)

    conv = AutoAWQConverter(group_size=G)
    tensors = {
        "model.layers.0.mlp.up_proj.qweight": awq_pack(orig_u4),
        "model.layers.0.mlp.up_proj.qzeros": awq_pack(zeros_u4),
        "model.layers.0.mlp.up_proj.scales": scales,
    }
    conv.validate(dict(tensors))
    out = conv.process(dict(tensors))

    assert "model.layers.0.mlp.up_proj.weight_packed" in out
    assert "model.layers.0.mlp.up_proj.qweight" not in out
    np.testing.assert_array_equal(
        out["model.layers.0.mlp.up_proj.weight_shape"], [N, K]
    )
    # scales transpose to (N, K/G)
    np.testing.assert_array_equal(
        out["model.layers.0.mlp.up_proj.weight_scale"], scales.T
    )
    # unpacking the CT packed weight gives the signed original, transposed
    unpacked = np.asarray(unpack_from_int32(
        jnp.asarray(out["model.layers.0.mlp.up_proj.weight_packed"]), 4,
        (N, K),
    ))
    np.testing.assert_array_equal(unpacked, (orig_u4 - 8).T)
    # zero point packs along dim 0
    zp = np.asarray(unpack_from_int32(
        jnp.asarray(out["model.layers.0.mlp.up_proj.weight_zero_point"]), 4,
        (N, K // G), packed_dim=0,
    ))
    np.testing.assert_array_equal(zp, (zeros_u4 - 8).T)


def test_awq_config():
    conv = AutoAWQConverter.from_autoawq_config(
        {"bits": 4, "group_size": 128, "zero_point": True, "version": "gemm",
         "quant_method": "awq", "modules_to_not_convert": ["visual"]}
    )
    config = conv.create_config()
    assert config.format == "pack-quantized"
    scheme = config.config_groups["config_group_0"]
    assert scheme.weights.symmetric is False
    assert "re:.*visual.*" in config.ignore


def test_awq_matches_reference(rng):
    from oracle import load_reference

    if load_reference() is None:
        pytest.skip("reference oracle unavailable")
    import torch
    from compressed_tensors.entrypoints.convert.converters.autoawq import (
        AutoAWQConverter as RefConv,
    )

    K, N, G = 64, 32, 32
    tensors_np = {
        "m.qweight": awq_pack(rng.integers(0, 16, size=(K, N)).astype(np.int64)),
        "m.qzeros": awq_pack(rng.integers(0, 16, size=(K // G, N)).astype(np.int64)),
        "m.scales": rng.random((K // G, N)).astype(np.float32),
    }
    ours = AutoAWQConverter(group_size=G).process(dict(tensors_np))
    theirs = RefConv(group_size=G).process(
        {k: torch.tensor(v) for k, v in tensors_np.items()}
    )
    for key in ("m.weight_packed", "m.weight_scale", "m.weight_zero_point",
                "m.weight_shape"):
        np.testing.assert_array_equal(
            np.asarray(ours[key]), theirs[key].numpy(), err_msg=key
        )


def test_fp8_block_dequantizer(rng):
    bh, bw = 8, 8
    w = (rng.normal(size=(16, 24)) * 10).astype(ml_dtypes.float8_e4m3fn)
    s = rng.random((2, 3)).astype(np.float32)
    conv = FP8BlockDequantizer(targets=["re:.*proj"],
                               weight_block_size=(bh, bw))
    out = conv.process({
        "x.proj.weight": w, "x.proj.weight_scale_inv": s,
    })
    dw = out["x.proj.weight"]
    assert dw.dtype == np.dtype(ml_dtypes.bfloat16)
    assert "x.proj.weight_scale_inv" not in out
    expected = w.astype(np.float32).reshape(2, 8, 3, 8) * s[:, None, :, None]
    np.testing.assert_allclose(
        dw.astype(np.float32),
        expected.reshape(16, 24).astype(ml_dtypes.bfloat16).astype(np.float32),
    )


def test_modelopt_nvfp4_renames(rng):
    conv = ModelOptNvfp4Converter(targets=["re:.*proj"])
    packed = rng.integers(0, 255, size=(8, 8)).astype(np.uint8)
    out = conv.process({
        "a.proj.weight": packed,
        "a.proj.weight_scale": rng.random((8, 1)).astype(ml_dtypes.float8_e4m3fn),
        "a.proj.weight_scale_2": np.asarray([4.0], dtype=np.float32),
        "a.proj.input_scale": np.asarray([2.0], dtype=np.float32),
    })
    np.testing.assert_array_equal(out["a.proj.weight_packed"], packed)
    assert "a.proj.weight" not in out
    np.testing.assert_allclose(out["a.proj.weight_global_scale"], [0.25])
    np.testing.assert_allclose(out["a.proj.input_global_scale"], [0.5])
    config = conv.create_config()
    assert config.format == "nvfp4-pack-quantized"


def test_ct_dequantizer_and_convert_checkpoint(rng, tmp_path):
    """End-to-end: our compressed checkpoint -> streaming dense conversion."""
    from testing_utils import make_tiny_llama_checkpoint

    qconfig = {
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
    src, states = make_tiny_llama_checkpoint(tmp_path, rng, qconfig)

    conv = CompressedTensorsDequantizer.from_pretrained(src)
    dst = str(tmp_path / "dense")
    convert_checkpoint(src, dst, conv, max_workers=2)

    # converted checkpoint has dense weights and no quantization_config
    with open(os.path.join(dst, "config.json")) as f:
        config = json.load(f)
    assert "quantization_config" not in config

    st = SafetensorsFile(os.path.join(dst, "model.safetensors"))
    names = st.keys()
    assert "model.layers.0.mlp.gate_proj.weight" in names
    assert not any("weight_packed" in n for n in names)

    # dequantized weight == fake-quantized original
    from compressed_tensors_tpu.ops import fake_quantize
    from compressed_tensors_tpu.quantization import QuantizationArgs

    got = st.get("model.layers.0.mlp.gate_proj.weight").astype(np.float32)
    args = QuantizationArgs(num_bits=4, type="int", group_size=32)
    fq = fake_quantize(
        states["model.layers.0.mlp.gate_proj"]["weight"],
        states["model.layers.0.mlp.gate_proj"]["weight_scale"], None, args,
    )
    np.testing.assert_allclose(got, np.asarray(fq), atol=2e-2, rtol=1e-2)


def test_build_inverse_weight_maps_cross_shard(tmp_path, rng):
    """Dependencies resolve across shards (ref converters/base.py:76-144)."""
    w = rng.integers(0, 100, size=(4, 16)).astype(np.int32)
    s = rng.random((4, 1)).astype(np.float32)
    save_safetensors(str(tmp_path / "a.safetensors"), {"m.qweight": w})
    save_safetensors(str(tmp_path / "b.safetensors"),
                     {"m.scales": s, "m.qzeros": w[:1]})

    from compressed_tensors_tpu.entrypoints.convert import (
        build_inverse_weight_maps,
    )

    conv = AutoAWQConverter()
    weight_map = {"m.qweight": "a.safetensors", "m.scales": "b.safetensors",
                  "m.qzeros": "b.safetensors"}
    model_files = {"a.safetensors": str(tmp_path / "a.safetensors"),
                   "b.safetensors": str(tmp_path / "b.safetensors")}
    inverse = build_inverse_weight_maps(weight_map, model_files, [conv])
    # qweight's shard job loads its partners from shard b
    assert set(inverse["a.safetensors"][str(tmp_path / "b.safetensors")]) == \
        {"m.scales", "m.qzeros"}
    # partner tensors are not primary for shard b
    assert "b.safetensors" not in inverse or not inverse["b.safetensors"]
