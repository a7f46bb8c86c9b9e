"""Relational operators Spark lacks as builtins, composed from DataFrame ops.

The reference implements no joins at all (SURVEY §2.2); these fill the
category checklist's remaining join variants with scale-sound plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, by: list[str], on: str,
              right_prefix: str = "r_") -> DataFrame:
    """Backward as-of join: each left row picks the LATEST right row with
    ``right.on <= left.on`` within the same ``by`` key (pandas merge_asof /
    DuckDB ASOF JOIN semantics; unmatched left rows keep nulls).

    Plan: union both sides tagged, one window pass per key ordered by
    (on, tag) carrying the last-seen right row forward — a single shuffle
    on ``by`` plus a sort, NO range-predicate join (a theta join here
    explodes quadratically per key at scale; the merge formulation is the
    10^12-row shape). Ties on ``on`` count as matches (right sorts first).

    Right columns come back prefixed with ``right_prefix``. ``on`` should
    be unique per (by, side) for fully deterministic results.
    """
    l_row = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    r_row = F.struct(*[F.col(c) for c in right.columns]).alias("__r")
    l = left.select(*[F.col(c) for c in by], F.col(on).alias("__on"), l_row)
    # SQL equality semantics: a NULL by-key matches nothing, so right rows
    # with NULL keys can never match — drop them (Window.partitionBy would
    # otherwise group the NULL keys of both sides together and match them).
    # An empty `by` is a global as-of join: no keys, nothing to filter.
    null_key = None
    for c in by:
        cond = F.col(c).isNull()
        null_key = cond if null_key is None else null_key | cond
    if null_key is not None:
        right = right.filter(~null_key)
    r = right.select(*[F.col(c) for c in by], F.col(on).alias("__on"), r_row)
    u = (
        r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))
        .withColumn("__tag", F.lit(0))
        .select(*by, "__on", "__l", "__r", "__tag")
        .unionByName(
            l.withColumn("__r", F.lit(None).cast(r.schema["__r"].dataType))
            .withColumn("__tag", F.lit(1))
            .select(*by, "__on", "__l", "__r", "__tag")
        )
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("__on", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in right.columns
    ]
    return matched.filter(F.col("__tag") == 1).select(*out_cols)
