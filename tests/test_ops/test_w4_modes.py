"""W4A16 kernel mode/layout matrix (r5): byte-packed b8 layouts (flat +
pre-tiled), int8-MXU act modes, XOR-offset high-plane algebra, and the
layout heuristic in prepare_for_kernels — all vs the dequantized-dense
oracle in Pallas interpret mode."""

from compressed_tensors_tpu.flags import set_flags

set_flags(pallas_interpret=True)

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.compressors import PackedQuantizationCompressor
from compressed_tensors_tpu.flags import flag_overrides
from compressed_tensors_tpu.ops import calculate_qparams
from compressed_tensors_tpu.ops.kernels.w4a16_matmul import (
    choose_k_tile,
    padded_k,
    repack_w4_b8,
    repack_w4_b8_tiled,
    retile_b8_scales,
    w4a16_matmul,
)
from compressed_tensors_tpu.ops.linear import (
    from_compressed_state,
    materialize_weight,
    prepare_for_kernels,
    quantized_matmul,
)
from compressed_tensors_tpu.quantization import preset_name_to_scheme

G = 128


def _dense_case(rng, n, k, asym=False):
    q = rng.integers(-8, 8, (n, k)).astype(np.int32)
    sc = (rng.random((n, k // G)) * 0.02 + 0.001).astype(np.float32)
    zp = (rng.integers(-8, 8, (n, k // G)).astype(np.int32) if asym
          else np.zeros((n, k // G), np.int32))
    w = ((q - zp.repeat(G, 1).reshape(n, k))
         * sc.repeat(G, 1).reshape(n, k))
    return q, sc, zp, w


@pytest.mark.parametrize("mode", ["int4b", "a8b"])
@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("asym", [False, True])
def test_b8_modes_match_dense(rng, mode, tiled, asym):
    n, k = 64, 1024
    tk = choose_k_tile(k, G)
    k_pad = padded_k(k, G)
    q, sc, zp, w = _dense_case(rng, n, k, asym)
    u = jnp.asarray(q + 8)
    wp = (repack_w4_b8_tiled(u, k_pad, tk, 128) if tiled
          else repack_w4_b8(u, k_pad, tk))
    sck, corr = retile_b8_scales(
        jnp.asarray(sc).T, jnp.asarray(zp).T.astype(jnp.float32)
        if asym else None, k_pad, tk, G)
    x = (rng.normal(size=(5, k)) * 0.5).astype(np.float32)
    y = np.asarray(w4a16_matmul(
        jnp.asarray(x), wp, sck, corr, n=n, k=k_pad, group_size=G, tk=tk,
        out_dtype=jnp.float32, mode=mode))
    y_ref = x @ w.T
    # a8 modes add per-token int8 act-quant noise (~0.4% relative)
    tol = 2e-2 if mode.startswith("a8") else 1e-2
    np.testing.assert_allclose(y, y_ref, atol=tol * np.abs(y_ref).max(),
                               rtol=tol)


@pytest.mark.parametrize("mode", ["int4", "a8", "mat"])
def test_int32_layout_modes_match_dense(rng, mode):
    from compressed_tensors_tpu.ops.kernels.w4a16_matmul import (
        repack_w4_for_kernel,
        retile_groups,
    )

    n, k = 64, 1024
    tk = choose_k_tile(k, G)
    k_pad = padded_k(k, G)
    q, sc, zp, w = _dense_case(rng, n, k)
    wp = repack_w4_for_kernel(jnp.asarray(q + 8), 4, k_pad, tk)
    sck = retile_groups(jnp.asarray(sc).T, k_pad, tk, G)
    x = (rng.normal(size=(5, k)) * 0.5).astype(np.float32)
    y = np.asarray(w4a16_matmul(
        jnp.asarray(x), wp, sck, None, n=n, k=k_pad, group_size=G, tk=tk,
        out_dtype=jnp.float32, mode=mode))
    y_ref = x @ w.T
    tol = 2e-2 if mode == "a8" else 1e-2
    np.testing.assert_allclose(y, y_ref, atol=tol * np.abs(y_ref).max(),
                               rtol=tol)


def test_b8_tiled_n_padding(rng):
    """n not a multiple of the tile width: the pre-tiled layout pads with
    zero bytes and zero scales -> padded columns contribute exactly 0."""
    n, k = 40, 1024
    tk = choose_k_tile(k, G)
    k_pad = padded_k(k, G)
    q, sc, zp, w = _dense_case(rng, n, k)
    wp = repack_w4_b8_tiled(jnp.asarray(q + 8), k_pad, tk, 128)
    assert wp.shape[0] == 1 and wp.shape[2] == 128
    sck, corr = retile_b8_scales(jnp.asarray(sc).T, None, k_pad, tk, G)
    x = (rng.normal(size=(3, k)) * 0.5).astype(np.float32)
    y = np.asarray(w4a16_matmul(
        jnp.asarray(x), wp, sck, corr, n=n, k=k_pad, group_size=G, tk=tk,
        out_dtype=jnp.float32, mode="int4b"))
    assert y.shape == (3, n)
    np.testing.assert_allclose(y, x @ w.T, atol=2e-2, rtol=1e-2)


def _prepared_qt(rng, preset, n, k):
    scheme = preset_name_to_scheme(preset, ["Linear"])
    args = scheme.weights
    w = (rng.normal(size=(n, k)) * 0.1).astype(np.float32)
    g = w.reshape(n, -1, args.group_size)
    scale, zp = calculate_qparams(jnp.asarray(g.min(-1)),
                                  jnp.asarray(g.max(-1)), args)
    state = {"weight": jnp.asarray(w), "weight_scale": scale}
    if not args.symmetric:
        state["weight_zero_point"] = zp
    compressed = PackedQuantizationCompressor.compress(state, scheme)
    return prepare_for_kernels(from_compressed_state(compressed, scheme))


def test_prepare_defaults_to_b8_layout(rng):
    qt = _prepared_qt(rng, "W4A16", 64, 256)
    assert qt.kernel_meta[0] == "w4b8"
    assert qt.kernel_packed.dtype == jnp.int8
    assert qt.kernel_zp is not None  # corr coefficients always present


def test_layout_heuristic_flat_for_deep_k(rng):
    """nt == 1 and deep K keeps the flat 2D layout (tile only when nt > 1
    or K is shallow — measured chain heuristic)."""
    qt_deep = _prepared_qt(rng, "W4A16", 64, 8192)
    assert qt_deep.kernel_packed.ndim == 2  # flat (K/2, N)
    qt_shallow = _prepared_qt(rng, "W4A16", 64, 1024)
    assert qt_shallow.kernel_packed.ndim == 3  # tiled
    qt_wide = _prepared_qt(rng, "W4A16", 8320, 8192)
    assert qt_wide.kernel_packed.ndim == 3  # nt > 1 tiles even at deep K


@pytest.mark.parametrize("preset", ["W4A16", "W4A16_ASYM"])
def test_quantized_matmul_int8_act_flag(rng, preset):
    """CT_TPU_W4_ACT=int8 routes the prepared b8 layout through the a8b
    mode and stays within act-quant tolerance of the bf16 path."""
    qt = _prepared_qt(rng, preset, 64, 256)
    x = jnp.asarray((rng.normal(size=(4, 256)) * 0.5).astype(np.float32))
    w_dense = np.asarray(materialize_weight(qt, dtype=jnp.float32))
    y_ref = np.asarray(x, np.float32) @ w_dense.T
    with flag_overrides(w4_act="int8"):
        y = np.asarray(quantized_matmul(x, qt))
    np.testing.assert_allclose(y, y_ref, atol=3e-2 * np.abs(y_ref).max(),
                               rtol=3e-2)


def test_xor_offset_identity():
    """The algebra the b8 layout relies on: for every u_hi in [0, 15] the
    signed int8 value ((u_hi ^ 8) << 4) equals 16*u_hi - 128."""
    for u_hi in range(16):
        byte = np.uint8((u_hi ^ 8) << 4)
        signed = np.int8(byte & 0xF0)
        assert int(signed) == 16 * u_hi - 128, u_hi


@pytest.mark.parametrize("num_bits,symmetric", [
    (2, True), (3, True), (5, True), (6, True), (7, True), (8, True),
    (3, False), (5, False), (7, False),
])
def test_wna16_widths_ride_grouped_int8_kernel(rng, num_bits, symmetric):
    """Every WnA16 width gets a fused kernel: non-4-bit packs expand to
    the grouped-int8 layout (zero points folded into the stored values)
    and match the XLA dequant path."""
    from compressed_tensors_tpu.quantization import QuantizationScheme

    scheme = QuantizationScheme(
        targets=["Linear"],
        weights={"num_bits": num_bits, "type": "int", "strategy": "group",
                 "group_size": 32, "symmetric": symmetric},
    )
    args = scheme.weights
    n, k = 48, 256
    w = (rng.normal(size=(n, k)) * 0.1).astype(np.float32)
    g = w.reshape(n, -1, args.group_size)
    scale, zp = calculate_qparams(jnp.asarray(g.min(-1)),
                                  jnp.asarray(g.max(-1)), args)
    state = {"weight": jnp.asarray(w), "weight_scale": scale}
    if not symmetric:
        state["weight_zero_point"] = zp
    compressed = PackedQuantizationCompressor.compress(state, scheme)
    qt = prepare_for_kernels(from_compressed_state(compressed, scheme))

    assert qt.kernel_packed is not None
    assert qt.kernel_meta[0] == "w4e8"
    assert qt.kernel_packed.dtype == jnp.int8

    x = jnp.asarray((rng.normal(size=(4, k)) * 0.5).astype(np.float32))
    y = np.asarray(quantized_matmul(x, qt))
    w_dense = np.asarray(materialize_weight(qt, dtype=jnp.float32))
    y_ref = np.asarray(x, np.float32) @ w_dense.T
    np.testing.assert_allclose(y, y_ref, atol=2e-2 * np.abs(y_ref).max(),
                               rtol=2e-2)


def test_w8a16_asym_falls_back(rng):
    """8-bit asym q - zp can overflow int8: stays on the XLA path."""
    from compressed_tensors_tpu.quantization import QuantizationScheme

    scheme = QuantizationScheme(
        targets=["Linear"],
        weights={"num_bits": 8, "type": "int", "strategy": "group",
                 "group_size": 32, "symmetric": False},
    )
    args = scheme.weights
    n, k = 16, 64
    w = (rng.normal(size=(n, k)) * 0.1).astype(np.float32)
    g = w.reshape(n, -1, args.group_size)
    scale, zp = calculate_qparams(jnp.asarray(g.min(-1)),
                                  jnp.asarray(g.max(-1)), args)
    state = {"weight": jnp.asarray(w), "weight_scale": scale,
             "weight_zero_point": zp}
    compressed = PackedQuantizationCompressor.compress(state, scheme)
    qt = prepare_for_kernels(from_compressed_state(compressed, scheme))
    assert qt.kernel_packed is None


def test_stacked_experts_ride_vmapped_kernel(rng):
    """3D (MoE) W4A16 expert stacks get stacked b8 kernel layouts and the
    batched expert matmul matches the XLA dequant path per expert."""
    from compressed_tensors_tpu.ops.linear import (
        prepare_experts_for_kernels,
        quantized_matmul_experts,
    )
    from compressed_tensors_tpu.ops.pack import pack_to_int32

    scheme = preset_name_to_scheme("W4A16", ["Linear"])
    E, n, k = 3, 32, 256
    q = rng.integers(-8, 8, (E, n, k)).astype(np.int8)
    sc = (rng.random((E, n, k // 128)) * 0.02 + 0.001).astype(np.float32)
    qt = prepare_experts_for_kernels(
        __import__("compressed_tensors_tpu.ops.linear",
                   fromlist=["QuantizedTensor"]).QuantizedTensor(
            weight_packed=pack_to_int32(jnp.asarray(q), 4),
            scale=jnp.asarray(sc),
            shape=(E, n, k), scheme=scheme,
            format="pack-quantized",
        ))
    assert qt.kernel_packed is not None
    assert qt.kernel_meta[0] == "w4b8"
    assert qt.kernel_packed.shape[0] == E

    x = jnp.asarray((rng.normal(size=(E, 5, k)) * 0.5).astype(np.float32))
    y = np.asarray(quantized_matmul_experts(x, qt))
    w = (q.reshape(E, n, -1, 128) * sc[..., None]).reshape(E, n, k)
    ref = np.einsum("eck,enk->ecn", np.asarray(x, np.float32), w)
    np.testing.assert_allclose(y, ref, atol=2e-2 * np.abs(ref).max(),
                               rtol=2e-2)
