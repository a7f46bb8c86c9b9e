"""M3 structured logger: reference record shape (core/logger.go:14-85)."""

from __future__ import annotations

import logging
import re
import sys

sys.path.insert(0, "/root/repo")

from flowforge.logger import get_logger, render_context  # noqa: E402


def test_record_shape():
    # own handler/buffer: the module's stderr handler binds sys.stderr at
    # first configure, so capsys can't intercept it reliably across tests
    import io

    from flowforge.logger import _DATEFMT, _FORMAT

    log = get_logger("testcomp")
    buf = io.StringIO()
    h = logging.StreamHandler(buf)
    h.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATEFMT))
    root = logging.getLogger("flowforge")
    root.addHandler(h)
    try:
        log.warn("something happened", bucket=7, column="text")
    finally:
        root.removeHandler(h)
    # TIMESTAMP | LEVEL | COMPONENT | MESSAGE | CONTEXT
    m = re.search(
        r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:,\d+)? \| WARNING \| "
        r"flowforge\.testcomp \| something happened \| bucket=7 column=text$",
        buf.getvalue(), re.M)
    assert m, buf.getvalue()


def test_context_rendering_stable():
    assert render_context({"b": 2, "a": 1}) == " | a=1 b=2"
    assert render_context({}) == ""


def test_file_sink(tmp_path):
    path = str(tmp_path / "pipeline.log")
    log = get_logger("filecomp", log_file=path)
    get_logger("othercomp", log_file=path)  # same file: no duplicate handler
    log.info("hello", n=1)
    # drop the file handler so later tests don't keep writing there
    root = logging.getLogger("flowforge")
    for h in list(root.handlers):
        if isinstance(h, logging.FileHandler):
            root.removeHandler(h)
    content = open(path).read()
    assert content.count("| INFO | flowforge.filecomp | hello | n=1") == 1
