"""Fused FP4 (NVFP4/MXFP4) dequant-matmul kernel vs the XLA materialize path
(interpret mode on CPU)."""


from compressed_tensors_tpu.flags import set_flags

set_flags(pallas_interpret=True)

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.compressors.base import BaseCompressor
from compressed_tensors_tpu.config import CompressionFormat
from compressed_tensors_tpu.ops import calculate_qparams
from compressed_tensors_tpu.ops.linear import (
    from_compressed_state,
    materialize_weight,
    prepare_for_kernels,
    quantized_matmul,
)
from compressed_tensors_tpu.ops.qparams import generate_gparam
from compressed_tensors_tpu.quantization import preset_name_to_scheme


def _make_fp4_qt(rng, preset, fmt, n=32, k=128):
    scheme = preset_name_to_scheme(preset, ["Linear"])
    args = scheme.weights
    w = (rng.normal(size=(n, k)) * 0.5).astype(np.float32)

    global_scale = None
    if preset.startswith("NVFP4"):
        global_scale = generate_gparam(jnp.asarray(w.min()),
                                       jnp.asarray(w.max()))

    g = w.reshape(n, -1, args.group_size)
    mn, mx = jnp.asarray(g.min(-1)), jnp.asarray(g.max(-1))
    scale, _ = calculate_qparams(mn, mx, args, global_scale=global_scale)

    state = {"weight": jnp.asarray(w), "weight_scale": scale}
    if global_scale is not None:
        state["weight_global_scale"] = global_scale
    compressor = BaseCompressor.get_value_from_registry(fmt.value)
    compressed = compressor.compress(dict(state), scheme)
    qt = from_compressed_state(compressed, scheme)
    return prepare_for_kernels(qt)


@pytest.mark.parametrize("preset,fmt", [
    ("NVFP4A16", CompressionFormat.nvfp4_pack_quantized),
    ("MXFP4A16", CompressionFormat.mxfp4_pack_quantized),
])
@pytest.mark.parametrize("batch", [1, 8])
def test_fp4_kernel_matches_materialize(rng, preset, fmt, batch):
    qt = _make_fp4_qt(rng, preset, fmt)
    assert qt.kernel_packed is not None
    assert qt.kernel_meta[0] == "fp4"
    # TK = 8 * group_size (16 nvfp4 / 32 mxfp4)
    assert qt.kernel_meta[5] == 8 * qt.scheme.weights.group_size

    x = jnp.asarray((rng.normal(size=(batch, 128)) * 0.5).astype(np.float32))
    y_kernel = np.asarray(quantized_matmul(x, qt))

    w_dense = materialize_weight(qt, dtype=jnp.float32)
    y_ref = np.asarray(x, np.float32) @ np.asarray(w_dense, np.float32).T
    np.testing.assert_allclose(y_kernel, y_ref, atol=2e-2, rtol=1e-2)


def test_fp4_kernel_unaligned_k(rng):
    """K not a multiple of TK: zero-padded columns must contribute 0."""
    qt = _make_fp4_qt(rng, "NVFP4A16", CompressionFormat.nvfp4_pack_quantized,
                      n=32, k=96)  # 96 % 128 != 0, 96 % 16 == 0
    assert qt.kernel_packed is not None
    x = jnp.asarray((rng.normal(size=(4, 96)) * 0.5).astype(np.float32))
    y_kernel = np.asarray(quantized_matmul(x, qt))
    w_dense = materialize_weight(qt, dtype=jnp.float32)
    y_ref = np.asarray(x, np.float32) @ np.asarray(w_dense, np.float32).T
    np.testing.assert_allclose(y_kernel, y_ref, atol=2e-2, rtol=1e-2)
