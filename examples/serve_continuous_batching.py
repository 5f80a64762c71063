"""Continuous-batching serving example: build a tiny W4A16 checkpoint,
load it run-compressed, and serve a mixed batch of requests through the
paged ServingEngine (prefix caching on). Runs on CPU; pass --tp 2 to run
the same engine tensor-parallel on a virtual 2-device mesh.

Run: python examples/serve_continuous_batching.py [--tp N]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

tp = 1
if "--tp" in sys.argv:
    tp = int(sys.argv[sys.argv.index("--tp") + 1])

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={max(tp, 1)}")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from testing_utils import make_tiny_llama_checkpoint  # noqa: E402

from compressed_tensors_tpu.engine import Request, ServingEngine  # noqa: E402
from compressed_tensors_tpu.models import load_llama_params  # noqa: E402

QUANT_CONFIG = {
    "config_groups": {
        "group_0": {
            "targets": ["Linear"],
            "weights": {"num_bits": 4, "type": "int", "symmetric": True,
                        "strategy": "group", "group_size": 32},
        }
    },
    "format": "pack-quantized",
    "ignore": ["lm_head"],
    "quant_method": "compressed-tensors",
    "quantization_status": "compressed",
}


def main():
    import pathlib

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as tmp:
        save_dir, _ = make_tiny_llama_checkpoint(
            pathlib.Path(tmp), rng, QUANT_CONFIG)
        params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                              dtype=jnp.float32)

        mesh = None
        if tp > 1:
            from compressed_tensors_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(tp=tp)
            print(f"serving tensor-parallel over {tp} devices")

        engine = ServingEngine(
            params, config, dtype=jnp.float32,
            max_batch=2, max_len=48, prefill_chunk=8,
            paged=True, page_size=8, prefix_caching=True,
            steps_per_sync=4, mesh=mesh,
        )

        shared_prefix = rng.integers(0, config.vocab_size, 16).tolist()
        for i in range(5):
            engine.submit(Request(
                request_id=i,
                prompt_ids=shared_prefix + [100 + i],
                max_new_tokens=6 + i,
            ))

        for c in sorted(engine.run(), key=lambda c: c.request_id):
            print(f"request {c.request_id}: {len(c.output_ids)} tokens "
                  f"({c.finish_reason}) -> {c.output_ids}")
        print(f"prefix cache hits: {engine.prefix_cache_hits} pages, "
              f"preemptions: {engine.preemptions}")


if __name__ == "__main__":
    main()
