"""Portability-linter corpus — the analogue of the reference's
tests/test_tools/test_lint_cuda.py (291 LoC) for this framework's AST
linter (tools/lint_kernels.py): every banned pattern is detected with the
right line number, allowed idioms pass clean, files lint end-to-end, and
the repository's own package is clean under the linter (the invariant
`make quality` enforces)."""

import os
import subprocess
import sys
import textwrap

import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "..", "tools")
sys.path.insert(0, TOOLS)

from lint_kernels import lint_file, lint_paths  # noqa: E402


@pytest.fixture
def lint(tmp_path):
    def run(source: str):
        path = tmp_path / "mod.py"
        path.write_text(textwrap.dedent(source))
        return lint_file(str(path))
    return run


# --------------------------------------------------------------------- #
# pallas_call interpret gate

def test_detect_pallas_call_without_interpret(lint):
    out = lint("""
        from jax.experimental import pallas as pl

        def f(x):
            return pl.pallas_call(kernel, grid=(1,))(x)
    """)
    assert len(out) == 1
    assert "interpret" in out[0]
    assert ":5:" in out[0]  # line number of the call


def test_pallas_call_with_interpret_passes(lint):
    out = lint("""
        from jax.experimental import pallas as pl

        def f(x):
            return pl.pallas_call(kernel, grid=(1,),
                                  interpret=_interpret())(x)
    """)
    assert out == []


def test_detect_fully_qualified_pallas_call(lint):
    out = lint("""
        import jax.experimental.pallas

        def f(x):
            return jax.experimental.pallas.pallas_call(kernel)(x)
    """)
    assert len(out) == 1


# --------------------------------------------------------------------- #
# hardcoded device selection

def test_detect_hardcoded_backend_positional(lint):
    out = lint("""
        import jax

        devs = jax.devices("tpu")
    """)
    assert len(out) == 1
    assert "tpu" in out[0]


def test_detect_hardcoded_backend_kwarg(lint):
    out = lint("""
        import jax

        devs = jax.local_devices(backend="cpu")
    """)
    assert len(out) == 1
    assert "backend=" in out[0]


def test_plain_devices_passes(lint):
    out = lint("""
        import jax

        devs = jax.devices()
        locs = jax.local_devices()
    """)
    assert out == []


def test_devices_with_non_string_arg_passes(lint):
    # process-index arg forms are not backend pins
    out = lint("""
        import jax

        devs = jax.local_devices(0)
    """)
    assert out == []


# --------------------------------------------------------------------- #
# host-side busy waits

def test_detect_time_sleep(lint):
    out = lint("""
        import time

        def poll():
            time.sleep(0.1)
    """)
    assert len(out) == 1
    assert "sleep" in out[0]


def test_other_time_functions_pass(lint):
    out = lint("""
        import time

        t0 = time.perf_counter()
        t1 = time.monotonic()
    """)
    assert out == []


# --------------------------------------------------------------------- #
# aggregate behaviors (ref test_complex_usage / test_no_duplicate_reports /
# test_lint_file_integration)

def test_multiple_violations_all_reported_once(lint):
    out = lint("""
        import time
        import jax
        from jax.experimental import pallas as pl

        def f(x):
            time.sleep(1)
            d = jax.devices("tpu")
            return pl.pallas_call(kernel)(x)
    """)
    assert len(out) == 3
    # one report per violation, no duplicates
    assert len(set(out)) == 3


def test_syntax_error_reported_not_raised(tmp_path):
    path = tmp_path / "bad.py"
    path.write_text("def f(:\n")
    out = lint_file(str(path))
    assert len(out) == 1
    assert "syntax error" in out[0]


def test_lint_paths_walks_directories(tmp_path):
    (tmp_path / "pkg").mkdir()
    (tmp_path / "pkg" / "ok.py").write_text("x = 1\n")
    (tmp_path / "pkg" / "bad.py").write_text(
        "import time\ntime.sleep(1)\n")
    out = lint_paths([str(tmp_path)])
    assert len(out) == 1
    assert "bad.py" in out[0]


def test_package_is_clean():
    """The shipped package passes its own linter (the `make quality`
    invariant, ref Makefile:12 lint_cuda wiring)."""
    repo = os.path.join(os.path.dirname(__file__), "..", "..")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "lint_kernels.py"),
         os.path.join(repo, "compressed_tensors_tpu")],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "clean" in proc.stdout
