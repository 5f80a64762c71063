"""PTQ + save example (the analogue of reference
examples/llama_1.1b/ex_config_quantization.py): build a toy model, apply a
quantization config, calibrate, compress, save, and reload run-compressed.

Run: python examples/quantize_and_save.py [W4A16|W8A8|FP8_DYNAMIC]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from compressed_tensors_tpu.compressors import (  # noqa: E402
    ModelCompressor,
    module_graph_from_names,
)
from compressed_tensors_tpu.quantization import QuantizationConfig  # noqa: E402
from compressed_tensors_tpu.quantization.lifecycle import (  # noqa: E402
    apply_quantization_config,
    calibrate_module,
)


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "W4A16"
    rng = np.random.default_rng(0)

    # a toy "model": three linear modules
    names = ["model.fc1", "model.fc2", "lm_head"]
    weights = {
        "model.fc1": rng.normal(size=(256, 512)).astype(np.float32),
        "model.fc2": rng.normal(size=(512, 256)).astype(np.float32),
        "lm_head": rng.normal(size=(1024, 256)).astype(np.float32),
    }
    modules = module_graph_from_names(names)

    config = QuantizationConfig(
        config_groups={preset: ["Linear"]},
        ignore=["lm_head"],
    )

    # lifecycle: apply -> calibrate -> compress
    states = apply_quantization_config(
        modules, {n: w.shape for n, w in weights.items()}, config
    )
    module_states = {}
    for name in names:
        w = jnp.asarray(weights[name])
        st = {"weight": w}
        if name in states:
            states[name] = calibrate_module(states[name], weight=w)
            st.update(states[name].qparams)
        module_states[name] = st

    mc = ModelCompressor(quantization_config=config)
    with tempfile.TemporaryDirectory() as save_dir:
        mc.save_checkpoint(save_dir, module_states, modules)
        print(f"saved compressed checkpoint to {save_dir}")

        mc2 = ModelCompressor.from_pretrained(save_dir)
        loaded, schemes = mc2.load_checkpoint(save_dir, run_compressed=True)
        for name, st in loaded.items():
            kinds = {k: f"{v.dtype}{list(v.shape)}" for k, v in st.items()}
            print(f"  {name}: {kinds}")


if __name__ == "__main__":
    main()
