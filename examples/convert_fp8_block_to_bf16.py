"""Dequantize a DeepSeek-style FP8 128x128-block checkpoint to bf16 (the
analogue of reference
examples/convert_checkpoint/deepseek32_fpblock_example.py /
qwen3_fpblock_example.py).

Each `weight` (fp8_e4m3) + `weight_scale_inv` (per 128x128 block) pair
becomes one dense bf16 tensor; MTP weights carry over unquantized and the
quantization_config is stripped from config.json.

Run: python examples/convert_fp8_block_to_bf16.py <fp8_block_dir> <out_dir>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from compressed_tensors_tpu.entrypoints.convert import (  # noqa: E402
    FP8BlockDequantizer,
    convert_checkpoint,
)


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    converter = FP8BlockDequantizer(
        # the fp8-block layer set of DeepSeek-class checkpoints
        # (ref examples/convert_checkpoint/deepseek32_fpblock_example.py)
        targets=[
            r"re:.*mlp.*\.(gate_up|gate|up|down)_proj$",
            r"re:.*self_attn.*\.(kv_b|o|q|q_a|q_b|k|v)_proj$",
            r"re:.*self_attn.kv_a_proj_with_mqa$",
        ],
    )
    convert_checkpoint(src, dst, converter, max_workers=8)
    print(f"converted {src} -> {dst}")


if __name__ == "__main__":
    main()
