"""spark-submit entry point: decode a chunk store back to parquet.

Usage:
    spark-submit --py-files flowforge.zip jobs/decode.py \
        --store <chunk store dir> --out <parquet dir> \
        [--columns url,text] [--predicate ts:LO:HI] \
        [--eq lang:en] [--in lang:en,de] [--prefix url:https://host3.] \
        [--partial]

--predicate col:lo:hi (repeatable) pushes an inclusive int-domain range
into the store: zone maps prune whole buckets and chunks before any
decoding (timestamps take epoch values in the column's unit).
--eq/--in/--prefix (repeatable) push equality, IN, and prefix filters:
strings/binary use bytes zone maps + the dictionary short-circuit; int
columns (--eq event_id:42, --in event_id:5,77) use [min,max] membership.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession

from flowforge import engine


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--columns", default=None,
                    help="comma-separated subset (default: all)")
    ap.add_argument("--predicate", action="append", default=[],
                    metavar="COL:LO:HI",
                    help="inclusive int-domain range filter (repeatable)")
    ap.add_argument("--eq", action="append", default=[], metavar="COL:VALUE",
                    help="string equality filter (repeatable)")
    ap.add_argument("--in", dest="isin", action="append", default=[],
                    metavar="COL:V1,V2", help="string IN filter (repeatable)")
    ap.add_argument("--prefix", action="append", default=[],
                    metavar="COL:PREFIX", help="string prefix filter")
    ap.add_argument("--partial", action="store_true",
                    help="decode the committed part of an incomplete store")
    args = ap.parse_args()

    predicates = {}
    # The decode engine holds ONE spec per column, so mixing flag kinds on
    # the same column (or repeating --eq/--in/--prefix for it) cannot be
    # expressed; last-one-wins would silently widen the result. Only
    # --predicate repeats combine (ranges intersect) — anything else errors.
    def _claim(col: str, kind: str) -> None:
        prev = pred_kinds.get(col)
        if prev is not None and not (prev == kind == "--predicate"):
            ap.error(
                f"conflicting filters for column {col!r}: {prev} and {kind} "
                "(only repeated --predicate ranges combine; a single column "
                "takes at most one of --eq / --in / --prefix)")
        pred_kinds[col] = kind

    pred_kinds: dict[str, str] = {}
    for spec in args.predicate:
        col, lo, hi = spec.rsplit(":", 2)
        lo, hi = int(lo), int(hi)
        _claim(col, "--predicate")
        if col in predicates:  # repeated column: intersect the ranges
            plo, phi = predicates[col]
            lo, hi = max(lo, plo), min(hi, phi)
        predicates[col] = (lo, hi)
    for spec in args.eq:
        col, v = spec.split(":", 1)
        _claim(col, "--eq")
        predicates[col] = ("eq", v)
    for spec in args.isin:
        col, vs = spec.split(":", 1)
        _claim(col, "--in")
        predicates[col] = ("in", vs.split(","))
    for spec in args.prefix:
        col, p = spec.split(":", 1)
        _claim(col, "--prefix")
        predicates[col] = ("prefix", p)
    columns = args.columns.split(",") if args.columns else None

    spark = SparkSession.builder.appName("flowforge-decode").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()
    df = engine.decode_table(
        spark, args.store, columns=columns,
        require_complete=not args.partial,
        predicates=predicates or None,
    )
    df.write.mode("overwrite").parquet(args.out)
    rows = spark.read.parquet(args.out).count()
    print(json.dumps({
        "job": "decode", "wall_sec": round(time.time() - t0, 3),
        "rows": rows, "columns": columns or "all",
        "predicates": {c: list(r) for c, r in predicates.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
