"""Structured Streaming ingestion into the chunk store.

The reference is a streaming pipeline: a Kafka consumer whose auto-committed
offsets are the resume point, feeding buffered per-type Parquet writers
(core/kafka.go:62-140, core/parquet.go:110-197). The Spark-idiomatic
restatement is ``readStream -> foreachBatch(encode)``:

- the stream source replaces the Kafka consumer (file source here — no Kafka
  jar is bundled in this sandbox; on a cluster, swap
  ``spark.readStream.format("kafka")`` + ``from_json`` in, nothing else
  changes);
- the streaming checkpoint replaces consumer-group offsets;
- each micro-batch encodes into its own disjoint bucket-id range
  (``batch_id * buckets_per_batch + salt``), so the chunk store accretes
  exactly like the reference's flush-numbered parquet files
  (core/parquet.go:229-232) but idempotently: if a batch is replayed after a
  crash, every already-committed bucket is skipped by the manifest resume
  protocol — foreachBatch's at-least-once becomes exactly-once without any
  extra bookkeeping;
- the triple flush trigger (size/count/interval, core/parquet.go:110-154)
  maps to the trigger policy: ``availableNow`` drains a backlog batch-style,
  ``processingTime`` gives the interval behavior; per-batch row caps come
  from the source (``maxFilesPerTrigger``).

Scale note: at 10^12 docs the stream is the tail of the table — the bulk is
encoded by the batch job (engine.encode_path); this path keeps the store
current as new WARC drops land, with the same store layout, the same codecs,
and the same lineage records.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from . import engine

DEFAULT_BUCKETS_PER_BATCH = 8


def stream_encode(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    *,
    buckets_per_batch: int | None = None,
    chunk_rows: int | None = None,
    salt_col: str | None = None,
    checkpoint: str | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
    source: str = "files",
    kafka=None,
) -> StreamingQuery:
    """Continuously encode parquet files landing in ``source_dir``.

    Returns the started :class:`StreamingQuery`; with ``available_now`` the
    caller typically ``awaitTermination()``s to drain the current backlog.

    The per-batch bucket stride is part of the store's immutable plan:
    batch N owns bucket ids [N*stride, (N+1)*stride), so restarting an
    existing checkpoint with a different stride would map replayed batch ids
    into already-committed ranges and silently drop rows. On restart the
    stored stride is adopted (``buckets_per_batch=None``) or must match
    exactly (:class:`~flowforge.catalog.StorePlanError` otherwise).
    """
    src_df = spark.read.parquet(source_dir)
    schema = src_df.schema
    manifest = engine.Manifest(out_dir)
    existing = manifest.try_read_table_meta()
    stored_plan = (existing or {}).get("plan") or {}
    if buckets_per_batch is None:
        buckets_per_batch = int(stored_plan.get("buckets", 0)) or DEFAULT_BUCKETS_PER_BATCH
    if chunk_rows is None:
        chunk_rows = int(stored_plan.get("chunk_rows", 0)) or engine.DEFAULT_CHUNK_ROWS
    if salt_col is None:
        salt_col = stored_plan.get("salt_col") or "url"
    # streaming mode exempts the store from decode_table's completeness
    # check (batch stores only); plan adoption/validation is the same
    # immutable-plan protocol the batch encoders use
    engine._adopt_or_create_plan(
        manifest, existing,
        {"format": engine.FORMAT_VERSION, "mode": "streaming",
         "buckets": buckets_per_batch, "chunk_rows": chunk_rows,
         "salt_col": salt_col},
        {"buckets": buckets_per_batch, "chunk_rows": chunk_rows,
         "salt_col": salt_col},
        src_df.columns, schema.jsonValue(), out_dir,
    )
    if source == "kafka":
        # config-selected Kafka path (core/kafka.go:42-140 analog): JSON
        # messages carrying the table schema; requires spark-sql-kafka on
        # the classpath (absent in this sandbox — see flowforge/kafka.py)
        if kafka is None:
            raise ValueError("source='kafka' requires a KafkaConfig")
        from pyspark.sql import functions as F

        from .kafka import build_stream_reader

        raw = build_stream_reader(spark, kafka).load()
        stream = raw.select(
            F.from_json(F.col("value").cast("string"), schema).alias("_r")
        ).select("_r.*")
    else:
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(source_dir)

    def handle_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        engine.run_encode(
            spark,
            batch_df,
            out_dir,
            buckets=buckets_per_batch,
            chunk_rows=chunk_rows,
            salt_col=salt_col,
            resume=True,  # replayed batches skip committed buckets
            bucket_offset=int(batch_id) * buckets_per_batch,
            mode="streaming",
        )

    # the checkpoint is Spark's own (Hadoop-FS) directory, not a chunk-store
    # object — resolve scheme'd store roots (e.g. fakes3://) to a path the
    # stream runner can actually open; real clusters pass `checkpoint=`
    # pointing at their durable FS explicitly
    from .storage import storage_for

    default_ckpt = storage_for(out_dir).read_path(
        os.path.join(out_dir, "_stream_checkpoint"))
    writer = stream.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint or default_ckpt,
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain(spark: SparkSession, source_dir: str, out_dir: str, **kw) -> None:
    """One-shot: encode everything currently in ``source_dir`` and stop."""
    q = stream_encode(spark, source_dir, out_dir, available_now=True, **kw)
    q.awaitTermination()


# --------------------------------------------------------------------------
# event-time / stateful streaming operators
# --------------------------------------------------------------------------
#
# The reference has no event-time handling: its hour-partitioned output uses
# WALL clock (core/parquet.go:207-214, late data filed under arrival hour)
# and its health metrics are in-process counters logged every 30 s
# (main.go:355-419). These are the Spark-idiomatic upgrades: real event-time
# tumbling windows with a watermark (late data handled explicitly, not
# misfiled), and the running per-key throughput counters as a custom
# stateful operator whose state survives restarts via the checkpoint.

def windowed_ingest_stats(stream, *, ts_col: str = "warc_ts",
                          key_col: str = "lang",
                          window: str = "1 hour",
                          slide: str | None = None,
                          watermark: str = "2 hours"):
    """Event-time tumbling (or sliding, with ``slide``) window ingest
    accounting (K1 done right).

    Returns a streaming DataFrame of (window, key, pages, bytes): the
    reference's year=/month=/day=/hour= layout keyed by EVENT time, with a
    watermark bounding state and dropping too-late rows deterministically
    (append mode emits a window only once it is final). A ``slide``
    smaller than ``window`` gives overlapping windows (each row lands in
    window/slide of them — rolling throughput averages)."""
    from pyspark.sql import functions as F

    # watermarks require TIMESTAMP (tz-aware); parquet NTZ columns cast up
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide).alias("win"),
                 F.col(key_col).alias("key"))
        .agg(
            F.count("*").alias("pages"),
            F.sum(F.octet_length("html") + F.octet_length("text")).alias("bytes"),
        )
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"), "key", "pages", "bytes")
    )


def session_ingest_windows(stream, *, ts_col: str = "warc_ts",
                           key_col: str = "lang",
                           gap: str = "30 minutes",
                           watermark: str = "2 hours"):
    """Event-time SESSION windows: per-key bursts separated by ``gap`` of
    silence collapse into one window (crawl-burst accounting — the dynamic
    counterpart of the fixed tumbling windows in
    :func:`windowed_ingest_stats`). Append mode emits a session once the
    watermark passes its close."""
    from pyspark.sql import functions as F

    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"),
                 F.col(key_col).alias("key"))
        .agg(F.count("*").alias("pages"))
        .select(F.col("sess.start").alias("sess_start"),
                F.col("sess.end").alias("sess_end"), "key", "pages")
    )


def running_key_totals(stream, *, key_expr=None, bytes_expr=None):
    """M1 as a custom stateful operator (applyInPandasWithState).

    Per-key running (rows, bytes) totals maintained in GroupState — the
    reference's throughput counters (main.go:371-397), but durable: state
    rides the streaming checkpoint, so a restarted job continues its
    counters instead of resetting to zero. Emits the updated totals for
    every key touched by each micro-batch (update semantics).

    State is O(distinct keys); at web scale key by host/log_type, not url.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_expr = key_expr if key_expr is not None else F.col("lang")
    bytes_expr = (bytes_expr if bytes_expr is not None
                  else F.octet_length("html") + F.octet_length("text"))
    keyed = stream.select(key_expr.alias("key"), bytes_expr.alias("nb"))

    def fn(key, pdfs, state):
        rows, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            rows += len(pdf)
            total += int(pdf["nb"].sum())
        state.update((rows, total))
        yield pd.DataFrame({"key": [key[0]], "rows": [rows], "bytes": [total]})

    return keyed.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType="key string, rows long, bytes long",
        stateStructType="rows long, bytes long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
