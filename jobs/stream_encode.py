"""spark-submit entry point for the streaming ingestion path.

Usage:
    spark-submit --py-files flowforge.zip jobs/stream_encode.py \
        --source <parquet dir being appended to> --out <chunk store dir> \
        [--buckets-per-batch N] [--salt-col url] [--continuous "30 seconds"]

Default drains the current backlog (availableNow) and exits; --continuous
keeps a processing-time trigger running. Replayed micro-batches after a
crash are skipped by the manifest's idempotent bucket commits
(flowforge/streaming.py).
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from flowforge import streaming


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--out", required=True)
    # None = adopt an existing store's plan on restart (explicit values
    # must match the stored plan or the job refuses)
    ap.add_argument("--buckets-per-batch", type=int, default=None)
    ap.add_argument("--salt-col", default=None)
    ap.add_argument("--continuous", default=None, metavar="INTERVAL",
                    help='run forever with a processing-time trigger, e.g. "30 seconds"')
    args = ap.parse_args()

    spark = SparkSession.builder.appName("flowforge-stream-encode").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    q = streaming.stream_encode(
        spark, args.source, args.out,
        buckets_per_batch=args.buckets_per_batch,
        salt_col=args.salt_col,
        available_now=args.continuous is None,
        processing_time=args.continuous,
    )
    q.awaitTermination()


if __name__ == "__main__":
    main()
