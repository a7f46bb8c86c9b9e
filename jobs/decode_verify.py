"""spark-submit entry point: decode a chunk store and verify vs the source.

Usage:
    spark-submit --py-files flowforge.zip jobs/decode_verify.py \
        --store <chunk store dir> --source <parquet path> [--columns a,b]

Checks (SURVEY §5 carry-over of the reference's raw_log oracle):
  1. row count matches
  2. decoded exceptAll source == 0 and source exceptAll decoded == 0
  3. per-url text byte equality (when url+text present)
Prints a one-line JSON verdict; exit code 1 on any mismatch.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from flowforge import engine


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--source", required=True)
    ap.add_argument("--columns", default=None)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("flowforge-decode-verify").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    columns = args.columns.split(",") if args.columns else None
    src = spark.read.parquet(args.source)
    if columns:
        src = src.select(*columns)
    decoded = engine.decode_table(spark, args.store, columns=columns)

    n_src, n_dec = src.count(), decoded.count()
    diff_a = decoded.exceptAll(src).count()
    diff_b = src.exceptAll(decoded).count()
    url_text_mismatch = None
    if {"url", "text"} <= set(decoded.columns):
        joined = src.select("url", F.col("text").alias("s")).join(
            decoded.select("url", F.col("text").alias("d")), "url"
        )
        url_text_mismatch = joined.filter(F.md5("s") != F.md5("d")).count()
    ok = n_src == n_dec and diff_a == 0 and diff_b == 0 and not url_text_mismatch
    print(json.dumps({
        "job": "decode_verify", "rows_source": n_src, "rows_decoded": n_dec,
        "exceptall_dec_minus_src": diff_a, "exceptall_src_minus_dec": diff_b,
        "url_text_mismatches": url_text_mismatch, "bit_identical": ok,
    }))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
