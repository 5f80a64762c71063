"""MTP (Multi-Token Prediction) tensor carry-over.

Mirrors `utils/mtp.py:20-87`: MTP layers are unquantized and excluded from
the quantized model's state dict; this copies them from the original
checkpoint into the quantized one, updates the safetensors index, and
appends ``re:^{prefix}.*`` to the quantization ignore list.
"""

from __future__ import annotations

import json
import os

import numpy as np

from compressed_tensors_tpu.config import QUANTIZATION_CONFIG_NAME
from compressed_tensors_tpu.logger import logger
from compressed_tensors_tpu.utils.safetensors_io import (
    CheckpointReader,
    get_weight_map,
    save_safetensors,
    update_safetensors_index,
)

__all__ = ["save_mtp_tensors_to_checkpoint"]


def save_mtp_tensors_to_checkpoint(
    source_model: str,
    dest_dir: str,
    mtp_prefix: str = "mtp",
    shard_name: str = "model_mtp.safetensors",
) -> None:
    """Copy MTP tensors from `source_model` into `dest_dir` as a new shard
    and exclude them from quantization.

    :param source_model: path to the original (unquantized) checkpoint
    :param dest_dir: quantized checkpoint directory to update
    :param mtp_prefix: tensor-name prefix identifying MTP tensors
    :param shard_name: filename of the new shard
    """
    reader = CheckpointReader(source_model)
    mtp_tensors = {
        name: np.asarray(reader.get(name))
        for name in reader.tensor_names()
        if name.startswith(mtp_prefix)
    }
    reader.close()

    if not mtp_tensors:
        logger.warning(f"Could not find MTP weights with prefix {mtp_prefix}")
        return

    # the destination must already be a checkpoint (index or single shard):
    # writing an MTP shard into an empty directory silently produces a
    # broken checkpoint (ref mtp.py raises on missing destination files)
    has_index = os.path.exists(
        os.path.join(dest_dir, "model.safetensors.index.json"))
    has_single = os.path.exists(os.path.join(dest_dir, "model.safetensors"))
    if not (has_index or has_single):
        raise ValueError(
            f"destination {dest_dir} has neither model.safetensors.index"
            ".json nor model.safetensors"
        )

    save_safetensors(os.path.join(dest_dir, shard_name), mtp_tensors,
                     metadata={"format": "pt"})

    weight_map = dict(get_weight_map(dest_dir))
    weight_map.update({key: shard_name for key in mtp_tensors})
    update_safetensors_index(dest_dir, weight_map)

    config_path = os.path.join(dest_dir, "config.json")
    if os.path.exists(config_path):
        with open(config_path) as f:
            config = json.load(f)
        quant_config = config.get(QUANTIZATION_CONFIG_NAME)
        if quant_config is not None:
            ignore_list = quant_config.get("ignore") or []
            pattern = f"re:^{mtp_prefix}.*"
            if pattern not in ignore_list:
                ignore_list.append(pattern)
                quant_config["ignore"] = ignore_list
                config[QUANTIZATION_CONFIG_NAME] = quant_config
                with open(config_path, "w") as f:
                    json.dump(config, f, indent=2)

    logger.info(f"Copied MTP weights from {source_model} to {dest_dir}")
