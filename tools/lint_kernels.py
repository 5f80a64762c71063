"""AST linter enforcing this framework's device-portability invariants.

The reference ships `tools/lint_cuda.py`, an AST linter that bans
`torch.cuda.*` in favor of `torch.accelerator.*` so the library stays
portable across accelerators. The TPU analogue enforces the invariants
that keep THIS framework testable off-TPU and backend-clean:

1. every `pl.pallas_call(...)` must pass `interpret=` — kernels without
   the interpret gate cannot run on the CPU CI mesh and silently rot;
2. no hardcoded `jax.devices("tpu")` / `jax.local_devices(backend=...)`
   in library code — device selection flows through `jax.devices()` and
   mesh construction so virtual-device testing keeps working;
3. no `time.sleep` or host-side busy-waits inside `compressed_tensors_tpu`
   (latency-critical serving paths must block on device futures, not
   timers).

Usage: python tools/lint_kernels.py [paths...]   (default: the package)
Exits non-zero and prints one line per violation.
"""

from __future__ import annotations

import ast
import os
import sys

DEFAULT_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "compressed_tensors_tpu")


def _dotted(node: ast.AST) -> str:
    """Best-effort dotted name of a call target."""
    parts = []
    while isinstance(node, ast.Attribute):
        parts.append(node.attr)
        node = node.value
    if isinstance(node, ast.Name):
        parts.append(node.id)
    return ".".join(reversed(parts))


class KernelLinter(ast.NodeVisitor):
    def __init__(self, path: str):
        self.path = path
        self.violations: list[tuple[int, str]] = []

    def visit_Call(self, node: ast.Call):
        name = _dotted(node.func)

        if name.endswith("pallas_call"):
            kwargs = {kw.arg for kw in node.keywords if kw.arg}
            if "interpret" not in kwargs:
                self.violations.append((
                    node.lineno,
                    "pallas_call without interpret= — kernels must stay "
                    "runnable on the CPU CI mesh (pass interpret=_interpret())",
                ))

        if name in ("jax.devices", "jax.local_devices"):
            for arg in node.args:
                if isinstance(arg, ast.Constant) and isinstance(
                        arg.value, str):
                    self.violations.append((
                        node.lineno,
                        f'hardcoded backend in {name}("{arg.value}") — '
                        "use jax.devices() + mesh construction",
                    ))
            for kw in node.keywords:
                if kw.arg == "backend":
                    self.violations.append((
                        node.lineno,
                        f"hardcoded backend= in {name} — use jax.devices()",
                    ))

        if name == "time.sleep":
            self.violations.append((
                node.lineno,
                "time.sleep in library code — block on device futures "
                "instead of timers",
            ))

        self.generic_visit(node)


def lint_file(path: str) -> list[str]:
    with open(path) as f:
        source = f.read()
    try:
        tree = ast.parse(source, filename=path)
    except SyntaxError as err:
        return [f"{path}:{err.lineno}: syntax error: {err.msg}"]
    linter = KernelLinter(path)
    linter.visit(tree)
    return [f"{path}:{line}: {msg}" for line, msg in linter.violations]


def lint_paths(paths: list[str]) -> list[str]:
    out: list[str] = []
    for root in paths:
        if os.path.isfile(root):
            out += lint_file(root)
            continue
        for dirpath, _, files in os.walk(root):
            for fname in sorted(files):
                if fname.endswith(".py"):
                    out += lint_file(os.path.join(dirpath, fname))
    return out


def main(argv: list[str]) -> int:
    paths = argv or [DEFAULT_ROOT]
    violations = lint_paths(paths)
    for v in violations:
        print(v)
    if violations:
        print(f"{len(violations)} violation(s)")
        return 1
    print("lint_kernels: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
