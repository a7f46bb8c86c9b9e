"""asof_join semantics + plan shape (merge-based, no range-join explosion)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from flowforge.functions.relational import asof_join  # noqa: E402


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("a", 10, "L1"), ("a", 20, "L2"), ("a", 5, "L0"), ("b", 7, "L3")],
        ["key", "t", "lval"])
    right = spark.createDataFrame(
        [("a", 8, "R8"), ("a", 15, "R15"), ("a", 20, "R20"), ("c", 1, "RC")],
        ["key", "t", "rval"])
    out = {(r["key"], r["t"]): r["r_rval"] for r in
           asof_join(left, right, by=["key"], on="t").collect()}
    assert out[("a", 5)] is None          # nothing at or before 5
    assert out[("a", 10)] == "R8"         # latest <= 10
    assert out[("a", 20)] == "R20"        # tie on t counts as a match
    assert out[("b", 7)] is None          # key with no right rows
    assert len(out) == 4                  # every left row survives


def test_asof_join_null_keys_never_match(spark):
    """SQL equality semantics: NULL by-keys match nothing (DuckDB ASOF /
    pandas merge_asof parity) — Window.partitionBy would otherwise group
    both sides' NULLs together."""
    left = spark.createDataFrame([(None, 10, "L"), ("a", 5, "L2")],
                                 "key string, t long, lval string")
    right = spark.createDataFrame([(None, 8, "R"), ("a", 3, "R2")],
                                  "key string, t long, rval string")
    out = {(r["key"], r["t"]): r["r_rval"] for r in
           asof_join(left, right, by=["key"], on="t").collect()}
    assert out[(None, 10)] is None
    assert out[("a", 5)] == "R2"


def test_asof_join_is_not_a_product(spark):
    left = spark.createDataFrame([("a", 1, "x")], ["key", "t", "lval"])
    right = spark.createDataFrame([("a", 1, "y")], ["key", "t", "rval"])
    plan = asof_join(left, right, by=["key"], on="t")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan  # the merge formulation: union + window
