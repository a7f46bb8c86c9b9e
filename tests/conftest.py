from __future__ import annotations

import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from flowforge.session import get_spark

    s = get_spark("flowforge-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_clean():
    d = tempfile.mkdtemp(prefix="flowforge_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
