"""Asymmetric pack-quantized compression round trips, ported from the
reference's tests/test_compressors/test_packed_asym_decompression.py:
zero points pack into int32 (packed_dim=0), decompress restores clean
weights, and asymmetric 4/8-bit quantization tracks biased distributions."""

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.compressors import (
    ModelCompressor,
    module_graph_from_names,
)
from compressed_tensors_tpu.ops import calculate_qparams
from compressed_tensors_tpu.quantization import (
    QuantizationArgs,
    QuantizationConfig,
    QuantizationScheme,
)


def create_asymmetric_quant_config(num_bits=4, strategy="group",
                                   group_size=128) -> QuantizationConfig:
    return QuantizationConfig(
        config_groups={
            "group_1": QuantizationScheme(
                targets=["Linear"],
                weights=QuantizationArgs(
                    num_bits=num_bits,
                    strategy=strategy,
                    group_size=group_size if strategy == "group" else None,
                    symmetric=False,
                ),
            ),
        },
        format="pack-quantized",
    )


def _calibrate(weight, args):
    """Per-group / per-channel min-max calibration (the reference's mock
    calibration fixtures)."""
    w = np.asarray(weight, np.float32)
    if args.strategy == "group":
        g = w.reshape(w.shape[0], -1, args.group_size)
        mn, mx = g.min(-1), g.max(-1)
    else:
        mn = w.min(-1, keepdims=True)
        mx = w.max(-1, keepdims=True)
    return calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)


def _quantized_states(weights: dict, config: QuantizationConfig):
    states = {}
    for name, w in weights.items():
        args = next(iter(config.config_groups.values())).weights
        scale, zp = _calibrate(w, args)
        states[name] = {"weight": jnp.asarray(w), "weight_scale": scale,
                        "weight_zero_point": zp}
    return states


@pytest.mark.parametrize("strategy,group_size",
                         [("group", 128), ("channel", None)])
def test_end_to_end_asymmetric_quantization(rng, strategy, group_size):
    """quantize -> compress -> decompress in memory
    (ref test_end_to_end_asymmetric_quantization)."""
    weights = {
        "layer1": rng.standard_normal((256, 512)).astype(np.float32),
        "layer2": rng.standard_normal((128, 256)).astype(np.float32),
    }
    config = create_asymmetric_quant_config(4, strategy, group_size)
    mc = ModelCompressor(quantization_config=config)
    modules = module_graph_from_names(list(weights))

    compressed = mc.compress_state(_quantized_states(weights, config),
                                   modules)
    for name in weights:
        # packed weight + int32-packed zero point (packed_dim=0,
        # ref pack_quantized/base.py zp packing)
        assert compressed[name]["weight_packed"].dtype == jnp.int32
        assert compressed[name]["weight_zero_point"].dtype == jnp.int32

    decompressed = mc.decompress_state(compressed, modules)
    for name, w in weights.items():
        out = np.asarray(decompressed[name]["weight"], np.float32)
        assert out.shape == w.shape
        assert np.isfinite(out).all()


@pytest.mark.parametrize("num_bits", [4, 8])
def test_asymmetric_quantization_accuracy(rng, num_bits):
    """Asymmetric group quantization tracks a biased (+2.0 mean) weight
    distribution (ref test_asymmetric_quantization_accuracy)."""
    shape = (256, 512)
    biased = (rng.standard_normal(shape) + 2.0).astype(np.float32)
    config = create_asymmetric_quant_config(num_bits, "group", 128)
    mc = ModelCompressor(quantization_config=config)
    modules = module_graph_from_names(["layer"])

    compressed = mc.compress_state(
        _quantized_states({"layer": biased}, config), modules)
    out = mc.decompress_state(compressed, modules)["layer"]["weight"]
    out = np.asarray(out, np.float32)
    assert out.shape == shape
    assert np.isfinite(out).all()
    threshold = np.std(rng.random(shape) - rng.random(shape))
    assert np.std(biased - out) < threshold


def test_asym_zero_point_pack_roundtrip(rng):
    """int32-packed zero points unpack to the original values exactly for
    every bit width (ref pack_quantized zp packed_dim=0 semantics)."""
    from compressed_tensors_tpu.ops.pack import pack_to_int32, unpack_from_int32

    for bits in (2, 4, 8):
        zp = (rng.integers(0, 2 ** bits, size=(64, 4)).astype(np.int32)
              - 2 ** (bits - 1)).astype(np.int8)
        packed = pack_to_int32(jnp.asarray(zp, jnp.int8), bits, packed_dim=0)
        unpacked = unpack_from_int32(packed, bits, zp.shape, packed_dim=0)
        np.testing.assert_array_equal(np.asarray(unpacked), zp)
