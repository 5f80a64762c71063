"""2:4-sparse stacked over int quant: the load-time dense scatter must feed
the fused kernels and match the sparse materialize path (BASELINE config 4).
Interpret mode on CPU."""


from compressed_tensors_tpu.flags import set_flags

set_flags(pallas_interpret=True)

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.compressors import (
    PackedQuantizationCompressor,
)
from compressed_tensors_tpu.compressors.sparse import Sparse24BitMaskCompressor
from compressed_tensors_tpu.ops import calculate_qparams
from compressed_tensors_tpu.ops.bitmask import get_24_bytemasks
from compressed_tensors_tpu.ops.linear import (
    from_compressed_state,
    materialize_weight,
    prepare_for_kernels,
    quantized_matmul,
)
from compressed_tensors_tpu.ops.quantize import quantize
from compressed_tensors_tpu.quantization import preset_name_to_scheme


def _sparse_quant_qt(rng, preset, n=64, k=256):
    """Build a 2:4-sparse weight, quantize it, stack both compressions the
    way ModelCompressor does (quantize -> sparse24 over the q values)."""
    scheme = preset_name_to_scheme(preset, ["Linear"])
    args = scheme.weights
    w = (rng.normal(size=(n, k)) * 0.1).astype(np.float32)
    w = w * np.asarray(get_24_bytemasks(jnp.asarray(w)))

    if args.strategy == "group":
        g = w.reshape(n, -1, args.group_size)
        mn, mx = g.min(-1), g.max(-1)
    else:
        mn, mx = w.min(-1, keepdims=True), w.max(-1, keepdims=True)
    scale, zp = calculate_qparams(jnp.asarray(mn), jnp.asarray(mx), args)

    w_q = quantize(jnp.asarray(w), scale, None, args, dtype=jnp.int8)
    state = {"weight": w_q, "weight_scale": scale}
    state = Sparse24BitMaskCompressor.compress(state, scheme)
    qt = from_compressed_state(state, scheme)
    return prepare_for_kernels(qt), w


@pytest.mark.parametrize("preset", ["W4A16", "W8A8"])
def test_sparse24_stacked_kernel_matches_materialize(rng, preset):
    qt, w = _sparse_quant_qt(rng, preset)
    assert qt.kernel_packed is not None, "sparse fast path should prepare"
    assert qt.kernel_meta[0] in (("w8a8",) if preset == "W8A8" else ("w4e8", "w4a16", "w4b8"))

    x = jnp.asarray((rng.normal(size=(4, 256)) * 0.5).astype(np.float32))
    y_kernel = np.asarray(quantized_matmul(x, qt))

    # reference: materialize through the sparse path (kernel leaves ignored)
    import dataclasses

    qt_sparse = dataclasses.replace(qt, kernel_packed=None,
                                    kernel_scales=None, kernel_zp=None,
                                    kernel_meta=None)
    w_dense = materialize_weight(qt_sparse, dtype=jnp.float32)
    # sparsity preserved through the stack
    assert (np.asarray(w_dense)[w == 0] == 0).all()
    y_ref = np.asarray(quantized_matmul(x, qt_sparse))
    atol = 2e-2 if preset == "W8A8" else 2e-3
    np.testing.assert_allclose(y_kernel, y_ref, atol=atol, rtol=1e-2)


def test_sparse24_asymmetric_skips_fast_path(rng):
    """Asymmetric quant can't scatter zeros as q=0; must keep sparse path."""
    qt, _ = _sparse_quant_qt(rng, "W4A16_ASYM")
    assert qt.kernel_packed is None
    assert qt.sparse_values is not None
