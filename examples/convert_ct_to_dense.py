"""Upconvert a compressed-tensors checkpoint back to dense bf16 (the
CompressedTensorsDequantizer — e.g. to fine-tune a W4A16 export or feed a
runtime without compressed-tensors support); the analogue of reference
examples/convert_checkpoint/kimi_k26_example.py.

The converter reads quantization_config from the source config.json, routes
each module's compressed tensors through the registered format codec's
decompress, and drops the quantization_config on the way out.

Run: python examples/convert_ct_to_dense.py <ct_checkpoint_dir> <out_dir>
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from compressed_tensors_tpu.entrypoints.convert import (  # noqa: E402
    CompressedTensorsDequantizer,
    convert_checkpoint,
)


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    with open(os.path.join(src, "config.json")) as f:
        quant_config = json.load(f)["quantization_config"]
    converter = CompressedTensorsDequantizer(quant_config)
    convert_checkpoint(src, dst, converter, max_workers=8)
    print(f"converted {src} -> {dst}")


if __name__ == "__main__":
    main()
