"""Runtime behavior flags, resolved from the environment ONCE at import.

The reference gates its kernel dispatch with a ``CT_ENFORCE_EAGER`` env var
read per call (ref utils/impl_backend.py:14-19). Under jit that pattern is
a trap: an env read at trace time bakes the ambient environment into the
compiled cache, and later env mutations silently do nothing (or worse,
retrace). Here every flag is read from the environment exactly once, at
import (load) time; traced code only ever sees the resolved Python values.

Programmatic control replaces env mutation:

- ``set_flags(pallas_interpret=True)`` — process-wide override
- ``with flag_overrides(enforce_eager=True): ...`` — scoped override
- ``reload_flags_from_env()`` — re-resolve (tests that really must use
  the environment set vars *before* importing the package)

Note jit caches key on traced *values*, not on this object: flipping a
flag after a function was traced affects only future traces. Thread
explicit arguments (``use_kernels=...``) through APIs for per-call
control; flags are the one-time default.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os

__all__ = ["FLAGS", "set_flags", "flag_overrides", "reload_flags_from_env"]


@dataclasses.dataclass
class _Flags:
    # force the jnp fallback paths everywhere (no Pallas kernels)
    enforce_eager: bool = False
    # run Pallas kernels in interpret mode (CPU CI) and treat the kernel
    # path as available off-TPU
    pallas_interpret: bool = False
    # W4A16 kernel weight layout: "auto" (byte-packed) | "b8" (byte-packed
    # nibble pairs, XOR-offset high plane) | "packed" (int4-in-int32) |
    # "e8" (signed int8 expansion)
    w4_layout: str = "auto"
    # W4A16 kernel decode mode for the int32 "packed" layout: "int4"
    # (nibble-plane affine correction) | "a8" (int8-MXU variant) | "mat"
    # (decode-to-bf16 matmul variant)
    w4_mode: str = "int4"
    # W4A16 activation execution precision: "auto" | "bf16" (checkpoint
    # semantics, bf16 MXU) | "int8" (per-token dynamic int8 acts on the
    # 2x-rate int8 MXU). "auto" = int8 at prefill row counts (>= 256 rows,
    # where the fused int8 chain measures ~30% faster and the act-quant
    # launches amortize), bf16 at decode rows. Measured NLL delta of the
    # int8 mode vs bf16 execution: ~1.5e-4 (bench.py reports it per run;
    # BASELINE target <= 0.05).
    w4_act: str = "auto"
    # row count at/above which the bf16-act W4A16 path dequantizes the
    # weight once and runs the dense MXU dot instead of the fused kernel.
    # 0 = never (default): measured on v5e at M=8192, dense-dequant runs
    # at 134-140 TF/s vs the fused b8 kernel's 145-151 — the dequant
    # producer costs more than the dense dot saves at every size tried.
    # Kept as an opt-in for parts where the dense MXU rate pulls further
    # ahead of the fused kernel.
    w4_dense_m: int = 0
    # decode attention kernel selection: "auto" | "flash" | "block"
    decode_attn: str = "auto"
    # disable the native (C++) IO/codec fast paths
    disable_native: bool = False
    # FP8 W8A8 weight handling on chips without a native fp8 MXU (v5e):
    # "auto" transcodes fp8 weights to the int8 MXU path at load (per-
    # channel rescale folded into weight_scale) when running on TPU;
    # "always" / "never" force it
    fp8_transcode: str = "auto"


def _from_env() -> _Flags:
    env = os.environ.get
    return _Flags(
        enforce_eager=env("CT_TPU_ENFORCE_EAGER", "") == "1",
        pallas_interpret=env("CT_TPU_PALLAS_INTERPRET", "") == "1",
        w4_layout=env("CT_TPU_W4_LAYOUT", "auto"),
        w4_mode=env("CT_TPU_W4_MODE", "int4"),
        w4_act=env("CT_TPU_W4_ACT", "auto"),
        w4_dense_m=int(env("CT_TPU_W4_DENSE_M", "0")),
        decode_attn=env("CT_TPU_DECODE_ATTN", "auto"),
        disable_native=env("CT_TPU_DISABLE_NATIVE", "") == "1",
        fp8_transcode=env("CT_TPU_FP8_TRANSCODE", "auto"),
    )


FLAGS = _from_env()


def set_flags(**kwargs) -> None:
    """Process-wide flag override; unknown names raise."""
    for name, value in kwargs.items():
        if not hasattr(FLAGS, name):
            raise AttributeError(f"unknown flag {name!r}")
        setattr(FLAGS, name, value)


@contextlib.contextmanager
def flag_overrides(**kwargs):
    """Scoped flag override (restores previous values on exit)."""
    prev = {name: getattr(FLAGS, name) for name in kwargs}
    set_flags(**kwargs)
    try:
        yield FLAGS
    finally:
        set_flags(**prev)


def reload_flags_from_env() -> None:
    """Re-resolve every flag from the current environment."""
    set_flags(**dataclasses.asdict(_from_env()))
