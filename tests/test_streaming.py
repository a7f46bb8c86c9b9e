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


def _file_stream(spark, src):
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(src)


def test_windowed_ingest_stats_with_watermark(spark, tmpdir_clean):
    """Event-time tumbling windows + watermark: counts keyed by EVENT hour
    (not arrival time, unlike the reference's wall-clock layout), and a
    too-late row is dropped once the watermark has passed its window."""
    import pyarrow as pa

    from flowforge import streaming

    src = os.path.join(tmpdir_clean, "src")
    os.makedirs(src)
    base = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z us

    def rows(ts_offsets_h, tag):
        n = len(ts_offsets_h)
        return pa.table({
            "url": pa.array([f"https://x/{tag}/{i}" for i in range(n)]),
            "warc_ts": pa.array([base + int(h * 3600e6) for h in ts_offsets_h],
                                pa.timestamp("us")),
            "html": pa.array([b"<x>"] * n, pa.binary()),
            "text": pa.array(["t"] * n),
            "lang": pa.array(["en"] * n),
        })

    pq.write_table(rows([0.1, 0.2, 1.5, 6.0], "a"), os.path.join(src, "a.parquet"))
    stats = streaming.windowed_ingest_stats(
        _file_stream(spark, src), window="1 hour", watermark="2 hours")
    ckpt = os.path.join(tmpdir_clean, "ckpt")

    def run_drain():
        batch_rows: list = []
        q = (stats.writeStream.foreachBatch(
                lambda df, bid: batch_rows.extend(df.collect()))
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return {(r["win_start"].hour, r["pages"]) for r in batch_rows}

    got = run_drain()
    # watermark now 6.0h - 2h = 4h: hour-0 and hour-1 windows are final
    assert (0, 2) in got and (1, 1) in got

    # a late row in hour 0 (< watermark) must be DROPPED, an on-time row in
    # hour 6 closes once the watermark advances past it
    pq.write_table(rows([0.5, 9.0], "b"), os.path.join(src, "b.parquet"))
    batch2 = run_drain()
    assert (0, 1) not in batch2 and (0, 3) not in batch2  # late row dropped
    assert (6, 1) in batch2


def test_sliding_windows_overlap(spark, tmpdir_clean):
    """slide < window: each row lands in window/slide overlapping windows."""
    import pyarrow as pa

    from flowforge import streaming

    src = os.path.join(tmpdir_clean, "src")
    os.makedirs(src)
    base = 1_767_225_600_000_000
    pq.write_table(pa.table({
        "url": pa.array(["https://x/0"]),
        "warc_ts": pa.array([base + int(90 * 60e6)], pa.timestamp("us")),  # 01:30
        "html": pa.array([b"<x>"], pa.binary()),
        "text": pa.array(["t"]),
        "lang": pa.array(["en"]),
    }), os.path.join(src, "a.parquet"))
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    stats = streaming.windowed_ingest_stats(
        stream, window="1 hour", slide="30 minutes", watermark="0 seconds")
    rows: list = []
    q = (stats.writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
         .outputMode("update")
         .option("checkpointLocation", os.path.join(tmpdir_clean, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    starts = sorted((r["win_start"].hour, r["win_start"].minute) for r in rows)
    # end-exclusive windows containing 01:30: [01:00,02:00) and [01:30,02:30)
    assert starts == [(1, 0), (1, 30)]


def test_session_windows_collapse_bursts(spark, tmpdir_clean):
    """Two bursts separated by > gap form two sessions; rows within gap
    merge (boundaries are event-time, not arrival)."""
    import pyarrow as pa

    from flowforge import streaming

    src = os.path.join(tmpdir_clean, "src")
    os.makedirs(src)
    base = 1_767_225_600_000_000
    offsets_min = [0, 5, 10, 120, 125, 600]  # bursts at 0-10, 120-125, 600
    n = len(offsets_min)
    pq.write_table(pa.table({
        "url": pa.array([f"https://x/{i}" for i in range(n)]),
        "warc_ts": pa.array([base + int(m * 60e6) for m in offsets_min],
                            pa.timestamp("us")),
        "html": pa.array([b"<x>"] * n, pa.binary()),
        "text": pa.array(["t"] * n),
        "lang": pa.array(["en"] * n),
    }), os.path.join(src, "a.parquet"))
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    sess = streaming.session_ingest_windows(stream, gap="30 minutes",
                                            watermark="1 hour")
    rows: list = []
    q = (sess.writeStream.foreachBatch(lambda df, bid: rows.extend(df.collect()))
         .outputMode("append")
         .option("checkpointLocation", os.path.join(tmpdir_clean, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # watermark reaches 600min - 60 = 540min: the first two sessions closed
    got = sorted((r["sess_start"].minute + r["sess_start"].hour * 60, r["pages"])
                 for r in rows)
    assert got == [(0, 3), (120, 2)]


def test_running_key_totals_stateful_across_restarts(spark, tmpdir_clean):
    """applyInPandasWithState: per-key running totals accumulate across
    separate drains because state rides the checkpoint."""
    from flowforge import datagen, streaming

    src = os.path.join(tmpdir_clean, "src")
    os.makedirs(src)
    pq.write_table(datagen.make_webpages(300, seed=1), os.path.join(src, "a.parquet"))
    ckpt = os.path.join(tmpdir_clean, "ckpt")

    def drain(qname):
        rows: list = []
        totals = streaming.running_key_totals(_file_stream(spark, src))
        q = (totals.writeStream.foreachBatch(
                lambda df, bid: rows.extend(df.collect()))
             .outputMode("update").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return {r["key"]: (r["rows"], r["bytes"]) for r in rows}

    t1 = drain("totals1")
    assert sum(r for r, _ in t1.values()) == 300
    # new file arrives; restarted query resumes its state from the checkpoint
    pq.write_table(datagen.make_webpages(200, seed=2, id_offset=300),
                   os.path.join(src, "b.parquet"))
    t2 = drain("totals2")
    # keys touched by batch 2 report CUMULATIVE counts (state persisted)
    assert sum(r for r, _ in t2.values()) > 200
    en1, en2 = t1.get("en", (0, 0)), t2.get("en", (0, 0))
    assert en2[0] > en1[0] and en2[1] > en1[1]


def test_stream_batches_are_bit_identical(spark, tmpdir_clean):
    src = os.path.join(tmpdir_clean, "src")
    out = os.path.join(tmpdir_clean, "store")
    _write_file(src, "a.parquet", 500, seed=7)
    streaming.drain(spark, src, out, buckets_per_batch=4)
    source = spark.read.parquet(src)
    decoded = engine.decode_table(spark, out)
    assert decoded.exceptAll(source).count() == 0
    assert source.exceptAll(decoded).count() == 0
