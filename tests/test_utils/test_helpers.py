"""Misc utils parity: Aliasable, ParameterizedDefaultDict, shard/combine,
safetensors header + nested weight mappings, qparam loading
(ref utils/helpers.py:200-430, utils/safetensors_load.py:302-545,
lifecycle/apply.py:49-97)."""

import enum

import jax.numpy as jnp
import numpy as np
import pytest

from compressed_tensors_tpu.utils import (
    Aliasable,
    ParameterizedDefaultDict,
    combine_shards,
    getattr_chain,
    shard_tensor,
)
from compressed_tensors_tpu.utils.safetensors_io import (
    get_nested_weight_mappings,
    get_quantization_parameter_to_path_mapping,
    get_safetensors_header,
    is_quantization_param,
    save_safetensors,
    update_safetensors_index,
)


class Color(Aliasable, str, enum.Enum):
    RED = "red"
    CRIMSON = "crimson"
    BLUE = "blue"

    @staticmethod
    def get_aliases():
        return {"crimson": "red"}


def test_aliasable_eq_and_hash():
    assert Color.RED == Color.CRIMSON
    assert Color.RED == "crimson"
    assert Color.CRIMSON == "red"
    assert Color.RED != Color.BLUE
    assert hash(Color.RED) == hash(Color.CRIMSON)
    assert len({Color.RED, Color.CRIMSON}) == 1


def test_parameterized_default_dict():
    calls = []

    def factory(a, b=10):
        calls.append((a, b))
        return a + b

    d = ParameterizedDefaultDict(factory)
    assert d[(1, 2)] == 3          # tuple key splats
    assert d[(1, 2)] == 3          # cached, factory not re-run
    assert calls == [(1, 2)]
    assert d.get(5, factory_kwargs={"b": 100}) == 105


def test_shard_and_combine_roundtrip():
    x = jnp.arange(24, dtype=jnp.float32).reshape(4, 6)
    shards = shard_tensor(x, [1, 3], dim=0)
    assert [s.shape for s in shards] == [(1, 6), (3, 6)]
    assert jnp.array_equal(combine_shards(shards, dim=0), x)

    cols = shard_tensor(x, [2, 2, 2], dim=1)
    assert jnp.array_equal(combine_shards(cols, dim=1), x)

    with pytest.raises(ValueError):
        shard_tensor(x, [1, 1], dim=0)
    with pytest.raises(ValueError):
        combine_shards([])
    with pytest.raises(ValueError):
        combine_shards([x, x.astype(jnp.int32)])


def test_getattr_chain_default():
    class A:
        pass

    a = A()
    a.b = A()
    a.b.c = 7
    assert getattr_chain(a, "b.c") == 7
    assert getattr_chain(a, "b.missing", 3) == 3
    with pytest.raises(AttributeError):
        getattr_chain(a, "b.missing")


def test_is_quantization_param():
    assert is_quantization_param("model.layers.0.q_proj.weight_scale")
    assert is_quantization_param("x.weight_zero_point")
    assert is_quantization_param("x.weight_g_idx")
    assert not is_quantization_param("model.layers.0.q_proj.weight")
    assert not is_quantization_param("x.bias")


@pytest.fixture
def sharded_ckpt(tmp_path, rng):
    t = {
        "m.a.weight": rng.standard_normal((4, 8)).astype(np.float32),
        "m.a.weight_scale": np.ones((4, 1), np.float32),
        "m.a.input_scale": np.ones((1,), np.float32),
    }
    t2 = {
        "m.b.weight": rng.standard_normal((4, 8)).astype(np.float32),
        "m.b.weight_scale": np.full((4, 1), 2.0, np.float32),
        "m.b.weight_zero_point": np.zeros((4, 1), np.int8),
    }
    save_safetensors(str(tmp_path / "model-00001.safetensors"), t)
    save_safetensors(str(tmp_path / "model-00002.safetensors"), t2)
    wm = {k: "model-00001.safetensors" for k in t}
    wm.update({k: "model-00002.safetensors" for k in t2})
    update_safetensors_index(str(tmp_path), wm)
    return tmp_path


def test_get_safetensors_header(sharded_ckpt):
    header = get_safetensors_header(
        str(sharded_ckpt / "model-00001.safetensors")
    )
    assert set(header) == {"m.a.weight", "m.a.weight_scale", "m.a.input_scale"}
    assert header["m.a.weight"]["shape"] == [4, 8]
    assert header["m.a.weight"]["dtype"] == "F32"


def test_nested_weight_mappings(sharded_ckpt):
    nested = get_nested_weight_mappings(str(sharded_ckpt))
    assert set(nested) == {"m.a", "m.b"}
    assert set(nested["m.a"]) == {"weight", "weight_scale", "input_scale"}
    assert nested["m.b"]["weight_scale"].endswith("model-00002.safetensors")

    only = get_nested_weight_mappings(str(sharded_ckpt), ["weight_scale"])
    assert set(only["m.a"]) == {"weight_scale"}


def test_qparam_path_mapping(sharded_ckpt):
    mapping = get_quantization_parameter_to_path_mapping(str(sharded_ckpt))
    assert "m.a.weight_scale" in mapping
    assert "m.a.input_scale" in mapping
    assert "m.a.weight" not in mapping


def test_load_pretrained_quantization_parameters(sharded_ckpt):
    from compressed_tensors_tpu.quantization import (
        QuantizationArgs,
        QuantizationScheme,
    )
    from compressed_tensors_tpu.quantization.lifecycle import (
        ModuleQuantState,
        load_pretrained_quantization_parameters,
    )

    scheme = QuantizationScheme(
        targets=["Linear"],
        weights=QuantizationArgs(num_bits=8, strategy="channel"),
        input_activations=QuantizationArgs(num_bits=8, strategy="tensor"),
    )
    states = {
        "m.a": ModuleQuantState(scheme=scheme),
        "m.b": ModuleQuantState(scheme=scheme),
    }
    load_pretrained_quantization_parameters(states, str(sharded_ckpt))
    # input qparams always load; symmetric checkpoint -> zp filled with zeros
    assert np.asarray(states["m.a"].qparams["input_scale"]) == 1.0
    assert np.asarray(states["m.a"].qparams["input_zero_point"]) == 0.0
    assert "weight_scale" not in states["m.a"].qparams

    load_pretrained_quantization_parameters(
        states, str(sharded_ckpt), load_weight_qparams=True
    )
    np.testing.assert_array_equal(
        np.asarray(states["m.b"].qparams["weight_scale"]),
        np.full((4, 1), 2.0, np.float32),
    )
    assert np.asarray(states["m.b"].qparams["weight_zero_point"]).shape == (4, 1)


def test_nested_weight_mappings_params_to_nest(tmp_path, rng):
    """get_nested_weight_mappings with params_to_nest and
    return_unmatched_params (ref test_safetensors_load.py:36-71)."""
    import jax.numpy as jnp

    from compressed_tensors_tpu.utils.safetensors_io import (
        get_nested_weight_mappings,
        save_safetensors,
    )

    tensors = {
        "layer1.weight": jnp.zeros((2, 2)),
        "layer1.bias": jnp.zeros((2,)),
        "layer2.weight": jnp.zeros((2, 2)),
        "layer2.bias": jnp.zeros((2,)),
        "layer3.weight": jnp.zeros((2, 2)),
    }
    path = str(tmp_path / "model.safetensors")
    save_safetensors(path, {k: np.asarray(v) for k, v in tensors.items()})

    nested = get_nested_weight_mappings(str(tmp_path), ["weight"])
    assert set(nested) == {"layer1", "layer2", "layer3"}
    assert all(set(v) == {"weight"} for v in nested.values())

    nested = get_nested_weight_mappings(str(tmp_path), ["weight", "bias"])
    assert set(nested["layer1"]) == {"weight", "bias"}
    assert set(nested["layer3"]) == {"weight"}

    nested, other = get_nested_weight_mappings(
        str(tmp_path), ["weight"], return_unmatched_params=True)
    assert all(set(v) == {"weight"} for v in nested.values())
    assert set(other) == {"layer1.bias", "layer2.bias"}
    assert all(p.endswith("model.safetensors") for p in other.values())
