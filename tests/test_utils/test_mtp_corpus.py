"""MTP tensor carry-over corpus, ported from the reference's
tests/test_utils/test_save_mtp_tensors.py: multi-shard extraction, index
updates (total_size accounting), index synthesis for single-shard
destinations, no-op on missing prefix, custom prefixes, missing-dest
errors."""

import json
import os

import numpy as np
import pytest
from safetensors.numpy import save_file

from compressed_tensors_tpu.utils.mtp import save_mtp_tensors_to_checkpoint

INDEX = "model.safetensors.index.json"
WEIGHTS = "model.safetensors"


def _read_safetensors(path):
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="numpy") as f:
        for key in f.keys():
            out[key] = f.get_tensor(key)
    return out


@pytest.fixture()
def source_dir(tmp_path, rng):
    src = tmp_path / "source"
    src.mkdir()
    shard1 = {"model.layer0.weight": rng.standard_normal((4, 4)).astype(
        np.float32),
        "mtp.layer0.weight": rng.standard_normal((3, 3)).astype(np.float32)}
    shard2 = {"model.layer1.weight": rng.standard_normal((4, 4)).astype(
        np.float32),
        "mtp.layer1.weight": rng.standard_normal((3, 3)).astype(np.float32)}
    save_file(shard1, str(src / "model-00001-of-00002.safetensors"))
    save_file(shard2, str(src / "model-00002-of-00002.safetensors"))
    index = {"metadata": {}, "weight_map": {
        "model.layer0.weight": "model-00001-of-00002.safetensors",
        "mtp.layer0.weight": "model-00001-of-00002.safetensors",
        "model.layer1.weight": "model-00002-of-00002.safetensors",
        "mtp.layer1.weight": "model-00002-of-00002.safetensors",
    }}
    (src / INDEX).write_text(json.dumps(index))
    return src


@pytest.fixture()
def dest_dir_with_index(tmp_path, rng):
    dest = tmp_path / "dest_index"
    dest.mkdir()
    shard = "model-00001-of-00001.safetensors"
    save_file({"model.layer0.weight": rng.standard_normal((4, 4)).astype(
        np.float32)}, str(dest / shard))
    (dest / INDEX).write_text(json.dumps(
        {"metadata": {}, "weight_map": {"model.layer0.weight": shard}}))
    return dest


def test_mtp_tensors_saved_correctly(source_dir, dest_dir_with_index):
    expected = {}
    for shard in ("model-00001-of-00002.safetensors",
                  "model-00002-of-00002.safetensors"):
        for k, v in _read_safetensors(str(source_dir / shard)).items():
            if k.startswith("mtp"):
                expected[k] = v

    save_mtp_tensors_to_checkpoint(str(source_dir),
                                   str(dest_dir_with_index))

    mtp_shard = dest_dir_with_index / "model_mtp.safetensors"
    assert mtp_shard.exists()
    saved = _read_safetensors(str(mtp_shard))
    assert set(saved) == set(expected)
    for key in expected:
        np.testing.assert_array_equal(saved[key], expected[key])
    assert all(k.startswith("mtp") for k in saved)


def test_mtp_from_checkpoint_with_existing_mtp_shard(dest_dir_with_index,
                                                     tmp_path, rng):
    """A checkpoint already carrying a model_mtp shard works as a source."""
    src = tmp_path / "src_with_mtp_shard"
    src.mkdir()
    save_file({"model.layer0.weight": rng.standard_normal((4, 4)).astype(
        np.float32)}, str(src / WEIGHTS))
    mtp = {"mtp.layer0.weight": rng.standard_normal((3, 3)).astype(
        np.float32)}
    save_file(mtp, str(src / "model_mtp.safetensors"))
    (src / INDEX).write_text(json.dumps({"metadata": {}, "weight_map": {
        "model.layer0.weight": WEIGHTS,
        "mtp.layer0.weight": "model_mtp.safetensors"}}))

    save_mtp_tensors_to_checkpoint(str(src), str(dest_dir_with_index))
    saved = _read_safetensors(
        str(dest_dir_with_index / "model_mtp.safetensors"))
    assert set(saved) == {"mtp.layer0.weight"}
    np.testing.assert_array_equal(saved["mtp.layer0.weight"],
                                  mtp["mtp.layer0.weight"])


def test_index_updated(source_dir, dest_dir_with_index):
    save_mtp_tensors_to_checkpoint(str(source_dir),
                                   str(dest_dir_with_index))
    index = json.loads((dest_dir_with_index / INDEX).read_text())
    weight_map = index["weight_map"]
    assert weight_map.get("mtp.layer0.weight") == "model_mtp.safetensors"
    assert weight_map.get("mtp.layer1.weight") == "model_mtp.safetensors"
    assert "model.layer0.weight" in weight_map
    expected_size = sum(
        os.path.getsize(dest_dir_with_index / s)
        for s in set(weight_map.values()))
    assert index["metadata"]["total_size"] == expected_size


def test_single_shard_dest_creates_index(source_dir, tmp_path, rng):
    dest = tmp_path / "dest_single"
    dest.mkdir()
    save_file({"model.layer0.weight": rng.standard_normal((4, 4)).astype(
        np.float32)}, str(dest / WEIGHTS))

    save_mtp_tensors_to_checkpoint(str(source_dir), str(dest))
    index = json.loads((dest / INDEX).read_text())
    assert index["weight_map"].get("model.layer0.weight") == WEIGHTS
    assert index["weight_map"].get("mtp.layer0.weight") == \
        "model_mtp.safetensors"


def test_no_mtp_tensors_no_op(dest_dir_with_index, tmp_path, rng):
    src = tmp_path / "src_no_mtp"
    src.mkdir()
    save_file({"model.weight": rng.standard_normal((4, 4)).astype(
        np.float32)}, str(src / WEIGHTS))
    save_mtp_tensors_to_checkpoint(str(src), str(dest_dir_with_index))
    assert not (dest_dir_with_index / "model_mtp.safetensors").exists()


def test_missing_dest_files_raises(source_dir, tmp_path):
    empty = tmp_path / "dest_empty"
    empty.mkdir()
    with pytest.raises((ValueError, FileNotFoundError)):
        save_mtp_tensors_to_checkpoint(str(source_dir), str(empty))


def test_custom_mtp_prefix(dest_dir_with_index, tmp_path, rng):
    src = tmp_path / "src_custom"
    src.mkdir()
    save_file({
        "model.weight": rng.standard_normal((4, 4)).astype(np.float32),
        "speculative.layer0.weight": rng.standard_normal((3, 3)).astype(
            np.float32),
        "mtp.layer0.weight": rng.standard_normal((3, 3)).astype(np.float32),
    }, str(src / WEIGHTS))

    save_mtp_tensors_to_checkpoint(str(src), str(dest_dir_with_index),
                                   mtp_prefix="speculative")
    saved = _read_safetensors(
        str(dest_dir_with_index / "model_mtp.safetensors"))
    assert set(saved) == {"speculative.layer0.weight"}
