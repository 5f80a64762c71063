"""Convert an NVIDIA ModelOpt NVFP4 checkpoint to compressed-tensors
nvfp4-pack-quantized (the analogue of reference
examples/convert_checkpoint/qwen3_nvfp4_example.py).

ModelOpt stores `weight` (packed uint8 nibbles), `weight_scale`
(fp8 per-group), `weight_scale_2` (global), plus k/v cache scales; the
converter renames/regroups them into the compressed-tensors vocabulary and
writes the quantization_config (incl. kv_cache_scheme) into config.json.

Run: python examples/convert_modelopt_nvfp4.py <modelopt_dir> <out_dir>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from compressed_tensors_tpu.entrypoints.convert import (  # noqa: E402
    ModelOptNvfp4Converter,
    convert_checkpoint,
)
from compressed_tensors_tpu.quantization import QuantizationArgs  # noqa: E402


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    converter = ModelOptNvfp4Converter(
        # the nvfp4-quantized layer set of Qwen3-class ModelOpt exports
        # (ref examples/convert_checkpoint/qwen3_nvfp4_example.py)
        targets=[
            r"re:.*mlp.*\.(gate_up|gate|up|down)_proj$",
            r"re:.*self_attn.*\.(q|k|v|o)_proj$",
        ],
        kv_cache_scheme=QuantizationArgs(num_bits=8, dynamic=False,
                                         type="float"),
    )
    convert_checkpoint(src, dst, converter, max_workers=8)
    print(f"converted {src} -> {dst}")


if __name__ == "__main__":
    main()
