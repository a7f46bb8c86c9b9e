"""spark-submit entry point: run SQL over chunk stores.

Usage:
    spark-submit --py-files flowforge.zip jobs/query.py \
        --store docs=/path/to/store [--store ev=/other/store] \
        --sql "SELECT lang, count(*) AS cnt FROM docs GROUP BY lang" \
        [--out /dir/for/parquet] [--limit 100] [--explain]

Each --store NAME=DIR registers a chunk store as a SQL view with filter
pushdown (flowforge/datasource.py); the statement itself goes through the
aggregate router (flowforge/sqlagg.py): routable aggregate / DISTINCT /
ORDER-BY-LIMIT shapes are answered from chunk/commit metadata and packed
dictionary code streams without decoding payloads; everything else runs
as ordinary Spark SQL over the pushdown relation — always the same rows,
only the cost differs. One JSON summary line goes to stdout; without
--out the result prints as a table (first --limit rows, default 100).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession

from flowforge import sqlagg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", action="append", required=True,
                    metavar="NAME=DIR",
                    help="register chunk store DIR as SQL view NAME "
                         "(repeatable)")
    ap.add_argument("--sql", required=True)
    ap.add_argument("--out", default=None,
                    help="write the result as parquet instead of showing it")
    ap.add_argument("--limit", type=int, default=100,
                    help="rows to show without --out (default 100)")
    ap.add_argument("--explain", action="store_true",
                    help="also print the routing decision / physical plan")
    args = ap.parse_args()

    stores = {}
    for item in args.store:
        name, sep, path = item.partition("=")
        if not sep or not name or not path:
            ap.error(f"--store takes NAME=DIR, got {item!r}")
        stores[name] = path

    spark = SparkSession.builder.appName("flowforge-query").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    route, reason = sqlagg.route_agg_sql_reason(spark, args.sql, stores)
    df = sqlagg.store_agg_sql(spark, args.sql, stores)
    if args.explain:
        if route is not None:
            print(f"ROUTED: {json.dumps(route, default=str)}")
            stats = sqlagg.route_pruning_stats(route)
            print(f"PRUNING: {json.dumps(stats)}")
        else:
            print(f"FALLBACK (filter-pushdown Spark execution): {reason}")
            df.explain()
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        rows = df.limit(args.limit).collect()
        n = len(rows)
        for r in rows:
            print(tuple(r))
    print(json.dumps({
        "job": "query", "wall_sec": round(time.time() - t0, 3),
        "routed": route is not None, "rows": n,
        "out": args.out,
    }))


if __name__ == "__main__":
    main()
