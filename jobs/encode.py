"""spark-submit entry point for the encode job.

Usage:
    spark-submit --py-files flowforge.zip jobs/encode.py \
        --input <parquet path or dir> --out <chunk store dir> \
        [--buckets N] [--chunk-rows N] [--salt-col url] [--no-resume]

Reads the source web-pages table, runs the salted repartition ->
sortWithinPartitions -> mapInArrow encode plan, prints the per-column
compression report and a one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession

from flowforge import engine


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", choices=["direct", "salted", "clustered"],
                    default="direct",
                    help="direct: no-shuffle scan-task encode (default); "
                         "salted: one shuffle onto url-hash buckets; "
                         "clustered: one shuffle onto quantile range "
                         "buckets of --cluster-col (tight zone maps)")
    ap.add_argument("--buckets", type=int, default=None)
    # None = adopt an existing store's plan on resume (explicit values
    # must match the stored plan or the job refuses)
    ap.add_argument("--chunk-rows", type=int, default=None)
    ap.add_argument("--salt-col", default=None)
    ap.add_argument("--sort-col", default=None,
                    help="direct mode: optional per-bucket re-cluster column")
    ap.add_argument("--cluster-col", default=None,
                    help="clustered mode: int-ordered column (e.g. warc_ts) "
                         "whose quantiles define the bucket ranges")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("flowforge-encode").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    if args.mode == "direct":
        metrics = engine.run_encode_path(
            spark, args.input, args.out,
            chunk_rows=args.chunk_rows, sort_col=args.sort_col or None,
            resume=not args.no_resume,
        )
    else:
        df = spark.read.parquet(args.input)
        metrics = engine.run_encode(
            spark, df, args.out,
            buckets=args.buckets, chunk_rows=args.chunk_rows,
            salt_col=args.salt_col, cluster_col=args.cluster_col,
            resume=not args.no_resume,
        )
    wall = time.time() - t0

    rep = engine.compression_report(spark, args.out)
    rep.show(truncate=False)
    bytes_in = sum(r["bytes_in"] for r in metrics)
    bytes_out = sum(r["bytes_out"] for r in metrics)
    print(json.dumps({
        "job": "encode", "wall_sec": round(wall, 3),
        "buckets_encoded": len({r["bucket"] for r in metrics}),
        "bytes_in": bytes_in, "bytes_out": bytes_out,
        "ratio": round(bytes_out / bytes_in, 4) if bytes_in else None,
        "gbps": round(bytes_in / wall / 1e9, 4) if wall > 0 else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
