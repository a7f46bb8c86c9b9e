"""spark-submit entry point for the compression / lineage report.

Usage:
    spark-submit --py-files flowforge.zip jobs/report.py --store <chunk store>
        [--by codec]

Prints the per-column compression report (bytes in/out, ratio, codecs) and a
one-line JSON summary — the batch analog of the reference's periodic health
metrics (main.go:355-419), read back from the store's lineage records
instead of logged and lost.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from flowforge import engine


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--by", choices=["column", "codec"], default="column")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("flowforge-report").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.by == "column":
        rep = engine.compression_report(spark, args.store)
    else:
        rep = (
            engine.metrics_table(spark, args.store)
            .groupBy("codecs")
            .agg(
                F.sum("bytes_in").alias("bytes_in"),
                F.sum("bytes_out").alias("bytes_out"),
                F.sum("n_rows").alias("n_rows"),
                F.count("*").alias("chunk_groups"),
            )
            .withColumn("ratio", F.round(F.col("bytes_out") / F.col("bytes_in"), 4))
            .orderBy("codecs")
        )
    rep.show(truncate=False)

    m = engine.metrics_table(spark, args.store)
    tot = m.agg(
        F.sum("bytes_in").alias("bi"), F.sum("bytes_out").alias("bo"),
        F.countDistinct("bucket").alias("buckets"), F.sum("wall_ms").alias("ms"),
    ).collect()[0]
    print(json.dumps({
        "job": "report",
        "buckets": tot["buckets"],
        "bytes_in": tot["bi"],
        "bytes_out": tot["bo"],
        "ratio": round(tot["bo"] / tot["bi"], 4) if tot["bi"] else None,
        "encode_cpu_sec": round((tot["ms"] or 0) / 1000, 1),
    }))


if __name__ == "__main__":
    main()
