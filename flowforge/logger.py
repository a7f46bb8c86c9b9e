"""Structured logger (M3 analog of core/logger.go:14-85).

Same record shape as the reference — ``TIMESTAMP | LEVEL | COMPONENT |
MESSAGE | CONTEXT`` — emitted through stdlib logging (stderr by default,
plus an optional file, mirroring the reference's dual sink). Context is a
dict rendered as stable ``k=v`` pairs.

Use :func:`get_logger` per component; the kernel's throttled codec-error
path and the driver jobs route through it, so worker stderr lines are
grep-able by component the way the reference's pipeline logs are.
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s | %(levelname)s | %(name)s | %(message)s"
_DATEFMT = "%Y-%m-%dT%H:%M:%S"
_configured = False
_file_sinks: set[str] = set()


def _ensure_configured(log_file: str | None = None) -> None:
    global _configured
    root = logging.getLogger("flowforge")
    if _configured and log_file is None:
        return
    fmt = logging.Formatter(_FORMAT, datefmt=_DATEFMT)
    if not _configured:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(fmt)
        root.addHandler(h)
        root.setLevel(logging.INFO)
        root.propagate = False
        _configured = True
    if log_file is not None:
        import os

        path = os.path.abspath(log_file)
        if path not in _file_sinks:  # one handler per file, however many callers
            fh = logging.FileHandler(path)
            fh.setFormatter(fmt)
            root.addHandler(fh)
            _file_sinks.add(path)


def render_context(context: dict | None) -> str:
    if not context:
        return ""
    return " | " + " ".join(f"{k}={context[k]}" for k in sorted(context))


class ComponentLogger:
    def __init__(self, component: str):
        self._log = logging.getLogger(f"flowforge.{component}")

    def _emit(self, level: int, message: str, context: dict | None) -> None:
        self._log.log(level, "%s%s", message, render_context(context))

    def info(self, message: str, **context) -> None:
        self._emit(logging.INFO, message, context)

    def warn(self, message: str, **context) -> None:
        self._emit(logging.WARNING, message, context)

    def error(self, message: str, **context) -> None:
        self._emit(logging.ERROR, message, context)


def get_logger(component: str, log_file: str | None = None) -> ComponentLogger:
    _ensure_configured(log_file)
    return ComponentLogger(component)
