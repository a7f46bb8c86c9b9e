"""Storage-backend contract: the five-call interface and its semantics."""

from __future__ import annotations

import os

import pytest

from flowforge.storage import ObjectStorage, PosixStorage, storage_for


@pytest.mark.parametrize("scheme", ["", "fakes3://"])
def test_put_get_list_delete_roundtrip(tmp_path, scheme):
    root = f"{scheme}{tmp_path}"
    st = storage_for(root)
    p = os.path.join(root, "a", "b.json")
    st.put_bytes(p, b"hello")
    assert st.get_bytes(p) == b"hello"
    assert st.exists(p)
    assert st.list(os.path.join(root, "a")) == ["b.json"]
    # overwrite put is atomic full replacement
    st.put_bytes(p, b"world!")
    assert st.get_bytes(p) == b"world!"
    st.delete(p)
    assert not st.exists(p)
    st.delete(p)  # idempotent
    assert st.list(os.path.join(root, "missing")) == []
    with pytest.raises(FileNotFoundError):
        st.get_bytes(p)


def test_scheme_resolution(tmp_path):
    assert isinstance(storage_for(str(tmp_path)), PosixStorage)
    s = storage_for(f"fakes3://{tmp_path}")
    assert isinstance(s, ObjectStorage)
    # read_path strips the scheme so pyarrow/open() can read the object
    assert s.read_path(f"fakes3://{tmp_path}/x") == f"{tmp_path}/x"


def test_object_backend_has_no_rename():
    """The protocol cannot lean on rename: no backend exposes one."""
    for cls in (PosixStorage, ObjectStorage):
        assert not any("rename" in name for name in dir(cls))


def test_no_stray_tmp_objects_after_put(tmp_path):
    st = storage_for(f"fakes3://{tmp_path}")
    for i in range(20):
        st.put_bytes(f"fakes3://{tmp_path}/obj-{i}", b"x" * i)
    names = sorted(os.listdir(tmp_path))
    assert names == sorted(f"obj-{i}" for i in range(20))
