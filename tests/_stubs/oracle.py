"""Load the upstream torch reference (read-only, at /root/reference) as a
numerical test oracle. Our implementation never imports from it; tests use it
only to assert bit-compatibility of codecs and math."""

import os
import sys
import types

_STUBS = os.path.dirname(os.path.abspath(__file__))
_REF_SRC = "/root/reference/src"


def load_reference():
    """Import and return the reference `compressed_tensors` package, or None
    if unavailable."""
    if "compressed_tensors" in sys.modules:
        return sys.modules["compressed_tensors"]
    if not os.path.isdir(_REF_SRC):
        return None
    if _STUBS not in sys.path:
        sys.path.insert(0, _STUBS)
    if _REF_SRC not in sys.path:
        sys.path.insert(0, _REF_SRC)
    vmod = types.ModuleType("compressed_tensors.version")
    vmod.__version__ = vmod.version = "0.0.0-oracle"
    vmod.version_base = "0.0.0"
    vmod.version_build = None
    sys.modules["compressed_tensors.version"] = vmod
    try:
        import compressed_tensors  # noqa: F401

        mod = sys.modules["compressed_tensors"]
        # `from .version import *` skips underscore names; some submodules
        # import compressed_tensors.__version__ directly
        if not hasattr(mod, "__version__"):
            mod.__version__ = vmod.__version__
        return mod
    except Exception:
        return None
