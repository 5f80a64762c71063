"""Dev tooling: the kernel-portability AST linter (the TPU analogue of the
reference's tools/lint_cuda.py device-portability linter)."""

import subprocess
import sys
import textwrap


def _lint_source(tmp_path, source):
    path = tmp_path / "mod.py"
    path.write_text(textwrap.dedent(source))
    sys.path.insert(0, "/root/repo/tools")
    try:
        from lint_kernels import lint_file

        return lint_file(str(path))
    finally:
        sys.path.pop(0)


def test_package_is_clean():
    """The shipped package passes its own linter."""
    result = subprocess.run(
        [sys.executable, "tools/lint_kernels.py"], cwd="/root/repo",
        capture_output=True, text=True)
    assert result.returncode == 0, result.stdout + result.stderr


def test_flags_pallas_call_without_interpret(tmp_path):
    out = _lint_source(tmp_path, """
        from jax.experimental import pallas as pl
        y = pl.pallas_call(kernel, out_shape=shape)(x)
    """)
    assert len(out) == 1 and "interpret" in out[0]


def test_accepts_pallas_call_with_interpret(tmp_path):
    out = _lint_source(tmp_path, """
        from jax.experimental import pallas as pl
        y = pl.pallas_call(kernel, out_shape=shape,
                           interpret=_interpret())(x)
    """)
    assert out == []


def test_flags_hardcoded_backend(tmp_path):
    out = _lint_source(tmp_path, """
        import jax
        devs = jax.devices("tpu")
        more = jax.local_devices(backend="cpu")
    """)
    assert len(out) == 2


def test_flags_time_sleep(tmp_path):
    out = _lint_source(tmp_path, """
        import time
        time.sleep(1)
    """)
    assert len(out) == 1 and "sleep" in out[0]
