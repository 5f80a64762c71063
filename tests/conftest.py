"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's CI strategy (SURVEY.md §4): numerics tests are
CPU-friendly; multi-chip sharding is validated on virtual CPU devices via
``xla_force_host_platform_device_count`` (the TPU analogue of the reference's
single-host `@torchrun` emulation).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def has_reference():
    """True if the upstream torch reference is importable (used as a test
    oracle for bit-compatibility golden tests)."""
    try:
        import compressed_tensors  # noqa: F401

        return True
    except Exception:
        return False
