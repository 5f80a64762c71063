"""Attention/KV-cache quantization hooks + impl backend + logger + MTP
(mirrors reference tests/test_modeling/test_attention_and_cache.py and
misc util tests)."""

import logging
import os

import jax.numpy as jnp
import numpy as np

from compressed_tensors_tpu.modeling import (
    calibrate_kv_scales,
    initialize_hooked_attention,
    quantize_post_rope,
    register_key_hook,
    register_query_hook,
)
from compressed_tensors_tpu.quantization import QuantizationArgs


def _kv_args():
    return QuantizationArgs(num_bits=8, type="float", strategy="tensor",
                            symmetric=True)


def test_initialize_attention_state():
    state = initialize_hooked_attention(_kv_args(), quantize_query=True)
    assert state.k_scale is not None
    assert state.v_scale is not None
    assert state.q_scale is not None
    assert state.scheme.input_activations.num_bits == 8


def test_calibrate_and_quantize(rng):
    state = initialize_hooked_attention(_kv_args(), quantize_query=True)
    k = jnp.asarray(rng.normal(size=(1, 8, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 8, 2, 16)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(1, 8, 4, 16)).astype(np.float32))

    state = calibrate_kv_scales(state, k, v, q)
    assert float(state.k_scale[0]) > 0

    qq, kq, vq = quantize_post_rope(state, q, k, v)
    # fp8 fake-quant keeps values close
    assert float(jnp.abs(kq - k).mean()) < 0.05
    assert float(jnp.abs(qq - q).mean()) < 0.05


def test_attn_head_state_shapes_and_calibration(rng):
    """attn_head strategy: head-shaped q/k/v scales (ref
    initialize_attn_qparams, initialize.py:279-334) and per-head min-max
    calibration producing distinct per-head values."""
    import pytest

    args = QuantizationArgs(num_bits=8, type="float", strategy="attn_head",
                            symmetric=True)
    with pytest.raises(ValueError, match="attn_head"):
        initialize_hooked_attention(args)  # heads required
    state = initialize_hooked_attention(args, quantize_query=True,
                                        num_heads=4, num_kv_heads=2)
    assert state.q_scale.shape == (4, 1, 1)
    assert state.k_scale.shape == (2, 1, 1)
    assert state.v_scale.shape == (2, 1, 1)

    # head 1's keys are 10x head 0's: calibrated scales must differ per head
    k = jnp.asarray(rng.normal(size=(1, 8, 2, 16)).astype(np.float32))
    k = k.at[:, :, 1].multiply(10.0)
    v = jnp.asarray(rng.normal(size=(1, 8, 2, 16)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(1, 8, 4, 16)).astype(np.float32))
    state = calibrate_kv_scales(state, k, v, q)
    ks = np.asarray(state.k_scale).reshape(-1)
    assert ks[1] > 5 * ks[0]

    kq = quantize_post_rope(state, None, k, None)[1]
    # per-head fp8 fake-quant keeps the large head accurate too
    assert float(jnp.abs(kq - k)[:, :, 1].mean()) < 0.5
    assert float(jnp.abs(kq - k)[:, :, 0].mean()) < 0.05


def test_attention_scheme_validation():
    """Attention schemes may only quantize input activations (ref
    _validate_attention_scheme, initialize.py:336-349)."""
    import pytest

    from compressed_tensors_tpu.modeling import validate_attention_scheme
    from compressed_tensors_tpu.quantization import QuantizationScheme

    acts = QuantizationArgs(num_bits=8, type="float", strategy="tensor")
    with pytest.raises(ValueError, match="weight quantization"):
        validate_attention_scheme(QuantizationScheme(
            targets=["re:.*self_attn$"], weights=acts,
            input_activations=acts))
    with pytest.raises(ValueError, match="input activations"):
        validate_attention_scheme(QuantizationScheme(
            targets=["re:.*self_attn$"]))
    with pytest.raises(ValueError, match="output quantization"):
        validate_attention_scheme(QuantizationScheme(
            targets=["re:.*self_attn$"], input_activations=acts,
            output_activations=acts))


def test_hooks_fire(rng):
    state = initialize_hooked_attention(None)
    seen = []

    register_query_hook(state, lambda v: seen.append("q") or v * 2)
    register_key_hook(state, lambda v: seen.append("k"))

    q = jnp.ones((2, 2))
    k = jnp.ones((2, 2))
    q2, k2, _ = quantize_post_rope(state, q, k, None)
    assert seen == ["q", "k"]
    np.testing.assert_array_equal(np.asarray(q2), 2 * np.ones((2, 2)))
    np.testing.assert_array_equal(np.asarray(k2), np.ones((2, 2)))  # None hook


def test_impl_backend_dispatch():
    from compressed_tensors_tpu.utils.impl_backend import ImplBackend

    calls = []

    @ImplBackend.register("test_op_x", req=lambda x: x > 0, priority=1)
    def fast_op(x):
        calls.append("fast")
        return x * 2

    @ImplBackend.entrypoint("test_op_x")
    def test_op(x):
        calls.append("eager")
        return x * 2

    assert test_op(1) == 2 and calls[-1] == "fast"
    assert test_op(-1) == -2 and calls[-1] == "eager"

    from compressed_tensors_tpu.flags import flag_overrides

    with flag_overrides(enforce_eager=True):
        assert test_op(1) == 2 and calls[-1] == "eager"

    assert ImplBackend.call("fast_op", 3) == 6
    assert "fast_op" in ImplBackend.registered("test_op_x")


def test_log_once(caplog):
    from compressed_tensors_tpu.logger import log_once, logger

    logger.disabled = False
    with caplog.at_level(logging.WARNING, logger="compressed_tensors_tpu"):
        log_once(logging.WARNING, "unique-test-message-%d", 42)
        log_once(logging.WARNING, "unique-test-message-%d", 42)
    assert sum(
        "unique-test-message" in r.getMessage() for r in caplog.records
    ) == 1


def test_mtp_carryover(tmp_path, rng):
    import json

    from compressed_tensors_tpu.utils.mtp import save_mtp_tensors_to_checkpoint
    from compressed_tensors_tpu.utils.safetensors_io import (
        SafetensorsFile,
        save_safetensors,
    )

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    dst.mkdir()

    save_safetensors(str(src / "model.safetensors"), {
        "model.w": rng.normal(size=(4,)).astype(np.float32),
        "mtp.head.weight": rng.normal(size=(8,)).astype(np.float32),
    })
    save_safetensors(str(dst / "model.safetensors"), {
        "model.w": rng.normal(size=(4,)).astype(np.float32),
    })
    with open(dst / "config.json", "w") as f:
        json.dump({"quantization_config": {"ignore": []}}, f)

    save_mtp_tensors_to_checkpoint(str(src), str(dst), mtp_prefix="mtp")

    st = SafetensorsFile(str(dst / "model_mtp.safetensors"))
    assert "mtp.head.weight" in st.keys()
    with open(dst / "config.json") as f:
        config = json.load(f)
    assert "re:^mtp.*" in config["quantization_config"]["ignore"]
    with open(dst / "model.safetensors.index.json") as f:
        index = json.load(f)
    assert index["weight_map"]["mtp.head.weight"] == "model_mtp.safetensors"
