"""Checkpoint conversion example (the analogue of reference
examples/convert_checkpoint/): convert an AutoAWQ GEMM checkpoint directory
to compressed-tensors pack-quantized.

Run: python examples/convert_awq.py <awq_checkpoint_dir> <out_dir>
"""

import sys

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from compressed_tensors_tpu.entrypoints.convert import (  # noqa: E402
    AutoAWQConverter,
    convert_checkpoint,
)


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    converter = AutoAWQConverter(bits=4, group_size=128, zero_point=True)
    convert_checkpoint(src, dst, converter, max_workers=4)
    print(f"converted {src} -> {dst}")


if __name__ == "__main__":
    main()
