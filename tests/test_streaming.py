"""Structured Streaming ingestion: file-source -> foreachBatch -> chunk store.

Covers the reference's streaming nature (Kafka consumer + offset resume,
core/kafka.go:62-140) restated as readStream + checkpoint + idempotent
bucket commits (see flowforge/streaming.py docstring).
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from flowforge import datagen, engine, streaming  # noqa: E402


def _write_file(src_dir: str, name: str, rows: int, seed: int,
                id_offset: int = 0) -> None:
    os.makedirs(src_dir, exist_ok=True)
    pq.write_table(
        datagen.make_webpages(rows, seed=seed, id_offset=id_offset),
        os.path.join(src_dir, name),
    )


def _decoded_urls(spark, out):
    return {r["url"] for r in engine.decode_table(spark, out).select("url").collect()}


def test_stream_drain_then_incremental(spark, tmpdir_clean):
    src = os.path.join(tmpdir_clean, "src")
    out = os.path.join(tmpdir_clean, "store")
    _write_file(src, "a.parquet", 400, seed=1)
    _write_file(src, "b.parquet", 300, seed=2, id_offset=400)

    streaming.drain(spark, src, out, buckets_per_batch=4)

    expect = {r["url"] for r in spark.read.parquet(src).select("url").collect()}
    assert _decoded_urls(spark, out) == expect

    from flowforge.catalog import Manifest

    def committed():
        man = Manifest(out)
        return man.committed_buckets(man.read_table_meta()["plan_hash"])

    n_commits_1 = len(committed())
    assert n_commits_1 >= 1

    # no new files -> draining again commits nothing new (checkpoint resume)
    streaming.drain(spark, src, out, buckets_per_batch=4)
    assert len(committed()) == n_commits_1

    # a late-arriving file is picked up incrementally, store stays consistent
    _write_file(src, "c.parquet", 200, seed=3, id_offset=700)
    streaming.drain(spark, src, out, buckets_per_batch=4)
    expect = {r["url"] for r in spark.read.parquet(src).select("url").collect()}
    assert _decoded_urls(spark, out) == expect
    # later batches land in a disjoint bucket-id range
    assert len(committed()) > n_commits_1


def test_stream_batches_are_bit_identical(spark, tmpdir_clean):
    src = os.path.join(tmpdir_clean, "src")
    out = os.path.join(tmpdir_clean, "store")
    _write_file(src, "a.parquet", 500, seed=7)
    streaming.drain(spark, src, out, buckets_per_batch=4)
    source = spark.read.parquet(src)
    decoded = engine.decode_table(spark, out)
    assert decoded.exceptAll(source).count() == 0
    assert source.exceptAll(decoded).count() == 0
