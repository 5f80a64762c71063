"""Fused qkv/gate_up projections: forward equivalence with unfused."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
from testing_utils import make_tiny_llama_checkpoint  # noqa: E402

from compressed_tensors_tpu.models import load_llama_params  # noqa: E402
from compressed_tensors_tpu.models.llama import llama_forward  # noqa: E402
from compressed_tensors_tpu.ops.fuse import fuse_llama_layers  # noqa: E402

W4A16_G32 = {
    "config_groups": {
        "group_0": {
            "targets": ["Linear"],
            "weights": {"num_bits": 4, "type": "int", "strategy": "group",
                        "group_size": 32, "symmetric": True},
        }
    },
    "format": "pack-quantized",
    "ignore": ["lm_head"],
    "quant_method": "compressed-tensors",
}


def test_fused_matches_unfused(rng, tmp_path):
    save_dir, _ = make_tiny_llama_checkpoint(tmp_path, rng, W4A16_G32)
    params, config, _ = load_llama_params(save_dir, run_compressed=True,
                                          dtype=jnp.float32)
    fused = fuse_llama_layers(params)

    assert "qkv_proj" in fused["layers"][0]
    assert "gate_up_proj" in fused["layers"][0]
    assert "q_proj" not in fused["layers"][0]
    # fused N = q + k + v out features
    assert fused["layers"][0]["qkv_proj"].shape[0] == 64 + 32 + 32

    ids = jnp.asarray(rng.integers(0, config.vocab_size, size=(2, 6)),
                      dtype=jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(6), (2, 6))
    logits_a, _ = llama_forward(params, config, ids, positions)
    logits_b, _ = llama_forward(fused, config, ids, positions)
    np.testing.assert_allclose(
        np.asarray(logits_a, np.float32), np.asarray(logits_b, np.float32),
        atol=1e-4, rtol=1e-4,
    )
