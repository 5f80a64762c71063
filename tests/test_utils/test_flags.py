"""Flags module: one-shot env resolution, programmatic overrides, and the
no-env-reads-under-trace invariant (VERDICT r3 item 7)."""

import ast
import os

import pytest

from compressed_tensors_tpu import flags as flags_mod
from compressed_tensors_tpu.flags import (
    FLAGS,
    flag_overrides,
    reload_flags_from_env,
    set_flags,
)


def test_set_flags_and_restore():
    original = FLAGS.w4_layout
    try:
        set_flags(w4_layout="e8")
        assert FLAGS.w4_layout == "e8"
    finally:
        set_flags(w4_layout=original)


def test_set_flags_unknown_name_raises():
    with pytest.raises(AttributeError):
        set_flags(not_a_flag=True)


def test_flag_overrides_scoped():
    before = FLAGS.enforce_eager
    with flag_overrides(enforce_eager=not before):
        assert FLAGS.enforce_eager is (not before)
    assert FLAGS.enforce_eager is before


def test_flag_overrides_restores_on_exception():
    before = FLAGS.w4_mode
    with pytest.raises(RuntimeError):
        with flag_overrides(w4_mode="mat"):
            raise RuntimeError
    assert FLAGS.w4_mode == before


def test_reload_from_env(monkeypatch):
    before = FLAGS.decode_attn
    try:
        monkeypatch.setenv("CT_TPU_DECODE_ATTN", "flash")
        reload_flags_from_env()
        assert FLAGS.decode_attn == "flash"
    finally:
        monkeypatch.delenv("CT_TPU_DECODE_ATTN", raising=False)
        reload_flags_from_env()
    assert FLAGS.decode_attn == "auto"
    set_flags(decode_attn=before)


def test_no_environ_reads_in_compute_paths():
    """The r3 trace-time env-flag finding: no os.environ access anywhere
    in ops/, models/, or engine/ — the flags module is the single
    resolution point."""
    import compressed_tensors_tpu

    pkg_root = os.path.dirname(compressed_tensors_tpu.__file__)
    offenders = []
    for sub in ("ops", "models", "engine"):
        for dirpath, _, files in os.walk(os.path.join(pkg_root, sub)):
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                path = os.path.join(dirpath, fname)
                tree = ast.parse(open(path).read(), filename=path)
                for node in ast.walk(tree):
                    if (isinstance(node, ast.Attribute)
                            and node.attr == "environ"):
                        offenders.append(f"{path}:{node.lineno}")
    assert not offenders, offenders
