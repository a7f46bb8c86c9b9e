"""Storage-backend contract: the five-call interface and its semantics."""

from __future__ import annotations

import os

import pytest

from flowforge.storage import (ObjectStorage, PosixStorage,
                               PyArrowFSStorage, storage_for)


@pytest.mark.parametrize("scheme", ["", "fakes3://", "pafs://"])
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
    p = storage_for(f"pafs://{tmp_path}")
    assert isinstance(p, PyArrowFSStorage)
    assert p.read_path(f"pafs://{tmp_path}/x") == f"{tmp_path}/x"


def test_s3_scheme_resolves_to_pyarrow_binding():
    """s3:// resolves to the PyArrowFSStorage cloud binding; the fs handle
    is a real pyarrow S3FileSystem and read_path keeps the full URI so
    executors stream chunks straight from the object store. Network calls
    are not made here (construction is local); actual S3 IO is covered by
    the pafs:// local-fs run of the same code path."""
    try:
        st = storage_for("s3://bucket/prefix")
    except Exception as e:  # no S3 support compiled into this pyarrow
        pytest.skip(f"pyarrow S3 unavailable: {e}")
    assert isinstance(st, PyArrowFSStorage)
    assert st._atomic_put  # whole-object PUT, no staging objects
    assert st.read_path("s3://bucket/prefix/chunks/a.parquet") == \
        "s3://bucket/prefix/chunks/a.parquet"
    assert st._key("s3://bucket/prefix/x.json") == "bucket/prefix/x.json"
    assert st.sweep_tmp("s3://bucket/prefix") == 0  # no-op by construction


def test_object_backend_has_no_rename():
    """The protocol cannot lean on rename: no backend exposes one."""
    for cls in (PosixStorage, ObjectStorage, PyArrowFSStorage):
        assert not any("rename" in name for name in dir(cls))


def test_no_stray_tmp_objects_after_put(tmp_path):
    st = storage_for(f"fakes3://{tmp_path}")
    for i in range(20):
        st.put_bytes(f"fakes3://{tmp_path}/obj-{i}", b"x" * i)
    names = sorted(os.listdir(tmp_path))
    assert names == sorted(f"obj-{i}" for i in range(20))


@pytest.mark.parametrize("scheme", ["", "fakes3://"])
def test_sweep_tmp_reaps_only_stale_staging_files(tmp_path, scheme):
    """A crash between tmp-write and replace strands <name>.<uuid>.tmp;
    sweep_tmp removes stale ones, never fresh ones or real objects."""
    import uuid

    root = f"{scheme}{tmp_path}"
    st = storage_for(root)
    st.put_bytes(os.path.join(root, "_manifest", "table.json"), b"{}")
    mdir = tmp_path / "_manifest"
    stale = mdir / f"commit-1-abc.json.{uuid.uuid4().hex}.tmp"
    fresh = mdir / f"commit-2-abc.json.{uuid.uuid4().hex}.tmp"
    notmine = mdir / "keep.tmp"  # not the staging pattern (no uuid32)
    for p in (stale, fresh, notmine):
        p.write_bytes(b"partial")
    old = os.path.getmtime(stale) - 7200
    os.utime(stale, (old, old))
    removed = st.sweep_tmp(root, older_than_sec=3600)
    assert removed == 1
    assert not stale.exists()
    assert fresh.exists() and notmine.exists()
    assert (mdir / "table.json").exists()


def test_compact_sweeps_stale_tmp(tmp_path, spark):
    """Manifest.compact opportunistically reaps orphaned staging files
    anywhere under the store root (ADVICE r3)."""
    import uuid

    from flowforge import datagen, engine

    out = str(tmp_path / "store")
    df = spark.createDataFrame(datagen.make_webpages(50).to_pandas())
    engine.run_encode(spark, df, out, buckets=2)
    # crash-orphaned staging files in both trees, old enough to reap
    stranded = [
        tmp_path / "store" / "_manifest" / f"x.json.{uuid.uuid4().hex}.tmp",
        tmp_path / "store" / "chunks" / f"c.bin.{uuid.uuid4().hex}.tmp",
    ]
    for p in stranded:
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"partial")
        old = os.path.getmtime(p) - 7200
        os.utime(p, (old, old))
    engine._compact_store(out)
    for p in stranded:
        assert not p.exists()
    # store still reads fine after the sweep
    assert engine.decode_table(spark, out, columns=["url"]).count() == 50
