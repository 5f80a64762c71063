"""Offload caches, dispatch planner, sharded loading, bin packing and
work-partitioned compression (mirrors reference tests/test_offload/ +
distributed tests, adapted to the TPU-native design)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, str(Path(__file__).parent.parent))

from compressed_tensors_tpu.distributed import (  # noqa: E402
    compress_state_parallel,
    greedy_bin_packing,
    partition_modules,
)
from compressed_tensors_tpu.offload import (  # noqa: E402
    DeviceCache,
    DiskCache,
    HostCache,
    SearchFailureError,
    disable_offloading,
    dispatch_plan,
    load_sharded_params,
    max_binary_search,
    stream_modules,
)


class TestGreedyBinPacking:
    def test_even_distribution(self):
        items = list(range(10))
        _, bins, owner = greedy_bin_packing(items, 2,
                                            item_weight_fn=lambda x: x)
        w0 = sum(bins[0])
        w1 = sum(bins[1])
        assert abs(w0 - w1) <= max(items)
        assert set(owner) == set(range(10))

    def test_sorted_descending(self):
        items = [3, 1, 2]
        sorted_items, _, _ = greedy_bin_packing(items, 2,
                                                item_weight_fn=lambda x: x)
        assert sorted_items == [3, 2, 1]

    def test_uniform_weights(self):
        _, bins, _ = greedy_bin_packing(list("abcdef"), 3)
        assert [len(b) for b in bins] == [2, 2, 2]


class TestBinarySearch:
    def test_finds_max(self):
        idx, val = max_binary_search(lambda i: i * 2, lambda v: v <= 14,
                                     0, 100)
        assert idx == 7 and val == 14

    def test_failure(self):
        with pytest.raises(SearchFailureError):
            max_binary_search(lambda i: i, lambda v: v < 0, 0, 10)


class TestDispatchPlan:
    def test_fits_one_device(self):
        plan = dispatch_plan({"a": 10, "b": 20}, [100])
        assert plan == {"a": 0, "b": 0}

    def test_spills_to_second_device(self):
        plan = dispatch_plan({"a": 60, "b": 60}, [100, 100])
        assert plan["a"] == 0 and plan["b"] == 1

    def test_maximizes_reserve(self):
        # both fit on dev0 with zero reserve; search should still spread if
        # that maximizes headroom -- greedy with max reserve puts b on dev1
        plan = dispatch_plan({"a": 40, "b": 40}, [100, 100])
        assert plan["a"] == 0 and plan["b"] == 1

    def test_host_offload_fallback(self):
        plan = dispatch_plan({"a": 80, "b": 80, "c": 300}, [100, 100])
        assert plan["c"] == -1
        assert plan["a"] == 0 and plan["b"] == 1

    def test_no_offload_raises(self):
        with pytest.raises(SearchFailureError):
            dispatch_plan({"a": 300}, [100], allow_host_offload=False)


class TestOffloadCaches:
    def test_host_cache_roundtrip(self):
        cache = HostCache()
        x = jnp.arange(8, dtype=jnp.float32)
        cache["w"] = x
        assert isinstance(cache._store["w"], np.ndarray)
        out = cache["w"]
        assert isinstance(out, jax.Array)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_host_cache_inplace_update(self):
        cache = HostCache()
        cache["w"] = jnp.zeros(4)
        buf = cache._store["w"]
        cache["w"] = jnp.ones(4)
        assert cache._store["w"] is buf  # updated in place
        np.testing.assert_array_equal(np.asarray(cache["w"]), np.ones(4))

    def test_device_cache(self):
        cache = DeviceCache()
        cache["w"] = np.arange(4.0)
        assert isinstance(cache._store["w"], jax.Array)
        assert len(cache) == 1
        del cache["w"]
        assert len(cache) == 0

    def test_disk_cache(self, tmp_path):
        import os

        cache = DiskCache(str(tmp_path))
        cache["w"] = np.arange(16, dtype=np.float32)
        path = cache._store["w"]
        assert os.path.exists(path)
        np.testing.assert_array_equal(np.asarray(cache["w"]),
                                      np.arange(16, dtype=np.float32))
        cache["w"] = np.ones(16, dtype=np.float32)  # in-place file rewrite
        assert cache._store["w"] == path
        del cache["w"]
        assert not os.path.exists(path)

    def test_disable_offloading_caches_onload(self):
        cache = HostCache()
        cache["w"] = np.zeros(4)
        with disable_offloading():
            a = cache["w"]
            b = cache["w"]
            assert a is b  # cached while disabled
        cache.evict()
        assert cache["w"] is not a


class TestShardedLoading:
    def test_load_sharded_params(self, tmp_path, rng):
        from compressed_tensors_tpu.utils.safetensors_io import save_safetensors

        w = rng.normal(size=(8, 16)).astype(np.float32)
        save_safetensors(str(tmp_path / "model.safetensors"), {"w": w})

        mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:4]), ("tp",))
        sharding = NamedSharding(mesh, P("tp", None))
        out = load_sharded_params(str(tmp_path), {"w": sharding})
        assert out["w"].sharding == sharding
        np.testing.assert_array_equal(np.asarray(out["w"]), w)

    def test_stream_modules_with_plan(self, tmp_path, rng):
        from compressed_tensors_tpu.utils.safetensors_io import save_safetensors

        tensors = {
            "layer.a.weight": rng.normal(size=(4, 4)).astype(np.float32),
            "layer.b.weight": rng.normal(size=(4, 4)).astype(np.float32),
        }
        save_safetensors(str(tmp_path / "model.safetensors"), tensors)
        plan = {"layer.a": 0, "layer.b": -1}
        seen = dict(stream_modules(str(tmp_path), plan))
        assert isinstance(seen["layer.a"]["weight"], jax.Array)
        assert isinstance(seen["layer.b"]["weight"], np.ndarray)


class TestModuleParallel:
    def test_partition_by_size(self):
        states = {
            "big": {"weight": np.zeros((100, 100), dtype=np.float32)},
            "small1": {"weight": np.zeros((10, 10), dtype=np.float32)},
            "small2": {"weight": np.zeros((10, 10), dtype=np.float32)},
        }
        bins, owner = partition_modules(states, 2)
        assert owner["big"] != owner["small1"]  # big alone, smalls together
        assert owner["small1"] == owner["small2"]

    def test_single_process_fallback(self, rng):
        """compress_state_parallel == compress_state when not distributed."""
        from compressed_tensors_tpu.compressors import (
            ModelCompressor,
            module_graph_from_names,
        )
        from testing_utils import make_tiny_llama_checkpoint

        config = {
            "config_groups": {
                "group_0": {
                    "targets": ["Linear"],
                    "weights": {"num_bits": 8, "type": "int",
                                "strategy": "channel", "symmetric": True},
                }
            },
            "format": "naive-quantized",
            "quant_method": "compressed-tensors",
        }
        from compressed_tensors_tpu.ops import calculate_qparams

        w = rng.normal(size=(8, 16)).astype(np.float32)
        mn = w.min(-1, keepdims=True)
        mx = w.max(-1, keepdims=True)
        mc = ModelCompressor.from_compression_config(config)
        scale, _ = calculate_qparams(
            jnp.asarray(mn), jnp.asarray(mx),
            mc.quantization_config.config_groups["group_0"].weights,
        )
        states = {"m.proj": {"weight": jnp.asarray(w), "weight_scale": scale}}
        modules = module_graph_from_names(["m.proj"])
        out = compress_state_parallel(mc, states, modules)
        assert out["m.proj"]["weight"].dtype == jnp.int8
