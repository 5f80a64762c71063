"""Module-level compress -> decompress round trips for every preset
scheme, ported from the reference's tests/test_compressors/
test_compress_decompress_module.py: format inference per preset, shape
and dtype restoration, actorder variants, embedding compression, and
Linear-only configs leaving embeddings untouched."""

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.compressors import (
    ModelCompressor,
    get_compressor,
    module_graph_from_names,
)
from compressed_tensors_tpu.compressors.format import infer_module_format
from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.ops import calculate_qparams
from compressed_tensors_tpu.ops.qparams import generate_gparam
from compressed_tensors_tpu.quantization import (
    QuantizationConfig,
    QuantizationScheme,
    QuantizationArgs,
    preset_name_to_scheme,
)


def _calibrated_state(rng, scheme, shape=(256, 256)):
    """ones-free random weight + per-strategy min-max calibration (the
    reference fills with ones; random keeps scales non-degenerate)."""
    w = rng.standard_normal(shape).astype(np.float32) * 0.05
    args = scheme.weights
    state = {"weight": jnp.asarray(w, jnp.bfloat16).astype(jnp.float32)}
    if args is None:
        return state
    if args.strategy == "tensor":
        mn, mx = w.min(), w.max()
    elif args.strategy == "channel":
        mn, mx = w.min(-1, keepdims=True), w.max(-1, keepdims=True)
    elif args.strategy in ("group", "tensor_group"):
        g = w.reshape(shape[0], -1, args.group_size)
        mn, mx = g.min(-1), g.max(-1)
    elif args.strategy == "block":
        bh, bw = args.block_structure
        b = w.reshape(shape[0] // bh, bh, shape[1] // bw, bw)
        b = b.transpose(0, 2, 1, 3)
        mn, mx = b.min(axis=(2, 3)), b.max(axis=(2, 3))
    else:
        raise ValueError(args.strategy)
    gparam = None
    if args.strategy == "tensor_group":
        gparam = generate_gparam(jnp.asarray(w.min()), jnp.asarray(w.max()))
        state["weight_global_scale"] = gparam
    scale, zp = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args,
                                  global_scale=gparam)
    state["weight_scale"] = scale
    if not args.symmetric:
        state["weight_zero_point"] = zp
    return state


MATRIX = [
    ("UNQUANTIZED", CompressionFormat.dense, None),
    ("W8A16", CompressionFormat.pack_quantized, None),
    ("W4A16", CompressionFormat.pack_quantized, None),
    ("W4A16", CompressionFormat.pack_quantized, "group"),
    ("W4A16_ASYM", CompressionFormat.pack_quantized, None),
    ("W4A16_ASYM", CompressionFormat.pack_quantized, "group"),
    ("W8A8", CompressionFormat.int_quantized, None),
    ("W4A8", CompressionFormat.int_quantized, None),
    ("W4AFP8", CompressionFormat.int_quantized, None),
    ("FP8", CompressionFormat.float_quantized, None),
    ("FP8_DYNAMIC", CompressionFormat.float_quantized, None),
    ("FP8_BLOCK", CompressionFormat.float_quantized, None),
    ("NVFP4A16", CompressionFormat.nvfp4_pack_quantized, None),
    ("NVFP4", CompressionFormat.nvfp4_pack_quantized, None),
    ("MXFP4A16", CompressionFormat.mxfp4_pack_quantized, None),
    ("MXFP4", CompressionFormat.mxfp4_pack_quantized, None),
]


@pytest.mark.parametrize(
    "scheme_name,expected_format,actorder", MATRIX,
    ids=[f"{m[0]}{'_actorder' if m[2] else ''}" for m in MATRIX])
def test_compress_decompress_module(rng, scheme_name, expected_format,
                                    actorder):
    """Round trip through the format inferred for each preset restores the
    weight's shape and float dtype (ref test_compress_decompress_module)."""
    scheme = preset_name_to_scheme(scheme_name, ["Linear"])
    if actorder is not None:
        scheme.weights.actorder = actorder
    fmt = infer_module_format("Linear", scheme)
    assert fmt == expected_format

    state = _calibrated_state(rng, scheme)
    if actorder == "group":
        perm = rng.permutation(256)
        state["weight_g_idx"] = jnp.asarray(
            (perm // scheme.weights.group_size).astype(np.int32))
    pre_shape = state["weight"].shape

    compressor = get_compressor(fmt.value)
    compressed = compressor.compress(dict(state), scheme)
    if fmt != CompressionFormat.dense:
        # the dense weight never survives compression
        assert ("weight" not in compressed
                or compressed["weight"].dtype != jnp.float32)

    decompressed = compressor.decompress(dict(compressed), scheme)
    out = decompressed["weight"]
    assert out.shape == pre_shape
    # bf16 registers as numpy kind 'V'; use the jnp dtype lattice
    assert jnp.issubdtype(out.dtype, jnp.floating)
    assert np.isfinite(np.asarray(out, np.float32)).all()


@pytest.mark.parametrize(
    "scheme_name,expected_format",
    [("W4A16", CompressionFormat.pack_quantized),
     ("NVFP4A16", CompressionFormat.nvfp4_pack_quantized),
     ("MXFP4A16", CompressionFormat.mxfp4_pack_quantized)],
)
def test_compress_decompress_embedding(rng, scheme_name, expected_format):
    """Embeddings compress weight-only, same codecs as Linear
    (ref test_compress_decompress_embedding)."""
    scheme = preset_name_to_scheme(scheme_name, ["Embedding"])
    fmt = infer_module_format("Embedding", scheme)
    assert fmt == expected_format
    state = _calibrated_state(rng, scheme)
    compressor = get_compressor(fmt.value)
    compressed = compressor.compress(dict(state), scheme)
    decompressed = compressor.decompress(dict(compressed), scheme)
    assert decompressed["weight"].shape == (256, 256)


def test_linear_only_config_leaves_embedding_untouched(rng):
    """A Linear-only config compresses the Linear and leaves the embedding
    byte-for-byte unchanged (ref
    test_linear_only_config_leaves_embedding_untouched)."""
    config = QuantizationConfig(
        config_groups={"group_0": QuantizationScheme(
            targets=["Linear"],
            weights=QuantizationArgs(num_bits=4, symmetric=True,
                                     strategy="group", group_size=32))},
        format="pack-quantized",
    )
    mc = ModelCompressor(quantization_config=config)
    modules = module_graph_from_names(["embed_tokens", "proj"])
    assert modules["embed_tokens"].type_name == "Embedding"

    scheme = config.config_groups["group_0"]
    proj_state = _calibrated_state(rng, scheme, shape=(64, 128))
    embed_w = rng.standard_normal((64, 128)).astype(np.float32)
    states = {"embed_tokens": {"weight": jnp.asarray(embed_w)},
              "proj": proj_state}

    out = mc.compress_state(states, modules)
    assert "weight_packed" in out["proj"]
    assert "weight" not in out["proj"]
    # embedding: untouched, byte-for-byte
    assert set(out["embed_tokens"]) == {"weight"}
    np.testing.assert_array_equal(np.asarray(out["embed_tokens"]["weight"]),
                                  embed_w)


@pytest.mark.parametrize(
    "strategy,symmetric,group_size",
    [("tensor", True, None), ("group", True, 128), ("channel", False, None)],
)
def test_int_quant_format(rng, strategy, symmetric, group_size):
    """int-quantized codec drops symmetric zero points and keeps asym ones
    (ref test_int_quant.py test_quant_format)."""
    scheme = QuantizationScheme(
        targets=["Linear"],
        weights=QuantizationArgs(strategy=strategy, group_size=group_size,
                                 symmetric=symmetric),
    )
    state = _calibrated_state(rng, scheme, shape=(512, 1024))
    compressor = get_compressor("int-quantized")
    compressed = compressor.compress(dict(state), scheme)
    assert compressed["weight"].dtype == jnp.int8
    if symmetric:
        assert "weight_zero_point" not in compressed
    else:
        assert "weight_zero_point" in compressed


@pytest.mark.parametrize(
    "strategy,group_size", [("tensor", None), ("channel", None)],
)
def test_fp8_quant_format(rng, strategy, group_size):
    """float-quantized codec stores fp8_e4m3 weights; symmetric zp
    stripped (ref test_fp8_quant.py)."""
    import ml_dtypes

    scheme = QuantizationScheme(
        targets=["Linear"],
        weights=QuantizationArgs(num_bits=8, type="float", strategy=strategy,
                                 symmetric=True),
    )
    state = _calibrated_state(rng, scheme, shape=(128, 256))
    compressor = get_compressor("float-quantized")
    compressed = compressor.compress(dict(state), scheme)
    assert compressed["weight"].dtype == jnp.dtype(ml_dtypes.float8_e4m3fn)
    assert "weight_zero_point" not in compressed
    decompressed = compressor.decompress(dict(compressed), scheme)
    got = np.asarray(decompressed["weight"], np.float32)
    want = np.asarray(state["weight"], np.float32)
    assert np.abs(got - want).max() < 0.1
