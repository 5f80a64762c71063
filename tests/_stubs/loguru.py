"""Minimal loguru stub so the upstream reference package can be imported as a
bit-compatibility test oracle (loguru is not installed in this image)."""

import logging


class _Logger:
    def __init__(self):
        self._log = logging.getLogger("loguru-stub")

    def bind(self, **kwargs):
        return self

    def remove(self, *args, **kwargs):
        return None

    def add(self, *args, **kwargs):
        return 0

    def __getattr__(self, name):
        if name in ("debug", "info", "warning", "error", "critical"):
            return getattr(self._log, name)
        return lambda *a, **k: None


logger = _Logger()
