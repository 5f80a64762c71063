"""Example scripts execute end to end (the analogue of the reference's
tests/test_examples/, which runs its notebook/scripts in CI)."""

import subprocess
import sys

import pytest

REPO = "/root/repo"


def _run(args, timeout=420):
    result = subprocess.run(
        [sys.executable, *args], cwd=REPO, capture_output=True, text=True,
        timeout=timeout,
    )
    assert result.returncode == 0, result.stdout + result.stderr
    return result.stdout


def test_bit_packing_example():
    out = _run(["examples/bit_packing.py"])
    assert out.strip()


@pytest.mark.parametrize("preset", ["W4A16", "W8A8"])
def test_quantize_and_save_example(preset):
    out = _run(["examples/quantize_and_save.py", preset])
    assert out.strip()


def test_bitmask_compression_example():
    out = _run(["examples/bitmask_compression.py"])
    assert "round trips exact" in out


def test_serving_example():
    out = _run(["examples/serve_continuous_batching.py"])
    assert "prefix cache hits" in out
