"""ORDER BY/LIMIT (top-k) pushdown: engine.topk_table + SQL routing.

The scale claim is zone-map pruning: on a ts-clustered store, top-k by ts
touches ~one bucket; the cutoff rule (accumulate guaranteed rows from the
best zone until >= k, prune everything provably below) is pinned directly
and via the kernel. Correctness is pinned against Spark's own ORDER BY
... LIMIT on the decoded store — identical row LIST (order included),
both directions, with a tie-heavy fixture.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flowforge import engine, sqlagg

ROWS = 4000


@pytest.fixture(scope="module")
def src_df(spark):
    rng = np.random.default_rng(11)
    # heavy ties in ts (only 50 distinct values) force tie-break coverage
    rows = [(int(i), int(rng.integers(0, 50)) * 1000, int(rng.integers(0, 9)),
             float(rng.standard_normal()), f"t{int(rng.integers(0, 5))}")
            for i in range(ROWS)]
    return spark.createDataFrame(
        rows, "event_id long, tsv long, user long, score double, tag string")


@pytest.fixture(scope="module")
def clustered(spark, src_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("topk")) + "/clustered"
    engine.run_encode(spark, src_df, out, buckets=16, cluster_col="tsv")
    return out


@pytest.fixture(scope="module")
def salted(spark, src_df, tmp_path_factory):
    # worst case for pruning: every bucket spans the whole ts range
    out = str(tmp_path_factory.mktemp("topk")) + "/salted"
    engine.run_encode(spark, src_df, out, buckets=8, salt_col="event_id")
    return out


def _spark_topk(src_df, k, descending):
    order = F.col("tsv").desc() if descending else F.col("tsv").asc()
    return [tuple(r) for r in
            src_df.orderBy(order, F.col("event_id").asc()).limit(k)
            .select("event_id", "tsv", "user").collect()]


@pytest.mark.parametrize("store_fixture", ["clustered", "salted"])
@pytest.mark.parametrize("descending", [True, False])
@pytest.mark.parametrize("k", [1, 25, ROWS + 10])
def test_topk_matches_spark(spark, src_df, request, store_fixture,
                            descending, k):
    out = request.getfixturevalue(store_fixture)
    got = [tuple(r) for r in
           engine.topk_table(spark, out, "tsv", k, descending=descending,
                             tie_col="event_id",
                             columns=["event_id", "tsv", "user"]).collect()]
    assert got == _spark_topk(src_df, k, descending)


def test_cutoff_rule():
    # three buckets: [0,10]x5 rows, [8,20]x5, [30,40]x5; top-3 descending
    # is guaranteed inside the [30,40] bucket -> cutoff 30 prunes the rest
    stats = [(0, 10, 5), (8, 20, 5), (30, 40, 5)]
    assert engine._topk_cutoff(stats, 3, True) == 30
    assert engine._topk_cutoff(stats, 6, True) == 8
    # ascending mirrors on max
    assert engine._topk_cutoff(stats, 3, False) == 10
    # fewer rows than k -> no sound cutoff
    assert engine._topk_cutoff(stats, 99, True) is None


def test_clustered_store_prunes_buckets(spark, clustered):
    _, nonempty = engine._plan_store(clustered)
    stats = [(int(r["columns"]["tsv"]["min"]), int(r["columns"]["tsv"]["max"]),
              int(r["n_rows"])) for r in nonempty]
    cut = engine._topk_cutoff(stats, 10, True)
    kept = sum(1 for lo, hi, n in stats if hi >= cut)
    # quantile range buckets: top-10 of 4000 rows lives in the last bucket
    # (ties at the boundary can keep a neighbor)
    assert kept <= 2, (kept, len(stats))


def test_topk_validation(spark, clustered):
    with pytest.raises(ValueError, match="tie_col is required"):
        engine.topk_table(spark, clustered, "tsv", 5)
    with pytest.raises(ValueError, match="positive"):
        engine.topk_table(spark, clustered, "tsv", 0, tie_col="event_id")
    with pytest.raises(ValueError, match="int-ordered or float"):
        engine.topk_table(spark, clustered, "tag", 5, tie_col="event_id",
                          columns=["event_id"])
    with pytest.raises(ValueError, match="int-ordered"):
        engine.topk_table(spark, clustered, "tsv", 5, tie_col="score",
                          columns=["event_id"])


def test_topk_sql_routing(spark, src_df, clustered):
    stores = {"ev": clustered}
    sql = ("SELECT event_id, tsv, user FROM ev "
           "ORDER BY tsv DESC, event_id LIMIT 25")
    assert sqlagg.route_agg_sql(spark, sql, stores) is not None
    got = [tuple(r) for r in
           sqlagg.store_agg_sql(spark, sql, stores).collect()]
    assert got == _spark_topk(src_df, 25, True)
    # WHERE + ORDER BY + LIMIT routes too (round 5): predicates reach the
    # topk kernel masks
    sql_w = ("SELECT event_id, tsv, user FROM ev WHERE user = 3 "
             "ORDER BY tsv DESC, event_id LIMIT 5")
    r = sqlagg.route_agg_sql(spark, sql_w, stores)
    assert r is not None and r["predicates"] == {"user": ("eq", 3)}
    got_w = [tuple(r) for r in
             sqlagg.store_agg_sql(spark, sql_w, stores).collect()]
    want_w = [tuple(r) for r in
              src_df.filter(F.col("user") == 3)
              .orderBy(F.col("tsv").desc(), F.col("event_id").asc())
              .limit(5).select("event_id", "tsv", "user").collect()]
    assert got_w == want_w
    # not routed: missing tie key, non-default tie direction
    for sql in [
        "SELECT event_id, tsv FROM ev ORDER BY tsv DESC LIMIT 5",
        "SELECT event_id, tsv FROM ev ORDER BY tsv DESC, event_id DESC "
        "LIMIT 5",
    ]:
        assert sqlagg.route_agg_sql(spark, sql, stores) is None
        fast = [tuple(r) for r in
                sqlagg.store_agg_sql(spark, sql, stores).collect()]
        slow = [tuple(r) for r in spark.sql(sql).collect()]
        assert sorted(fast) == sorted(slow)


@pytest.mark.parametrize("store_fixture", ["clustered", "salted"])
@pytest.mark.parametrize("descending", [True, False])
def test_topk_with_predicates(spark, src_df, request, store_fixture,
                              descending):
    """Round-5: filtered top-k — predicate masks apply before the local
    select_k, Spark row-list parity on both layouts."""
    out = request.getfixturevalue(store_fixture)
    for preds, cond in [
        ({"tag": ("eq", "t1")}, F.col("tag") == "t1"),
        ({"user": (2, 6)}, (F.col("user") >= 2) & (F.col("user") <= 6)),
        ({"tag": ("or", [("eq", "t0"), ("eq", "t3")])},
         (F.col("tag") == "t0") | (F.col("tag") == "t3")),
    ]:
        got = [tuple(r) for r in
               engine.topk_table(spark, out, "tsv", 20,
                                 descending=descending, tie_col="event_id",
                                 columns=["event_id", "tsv", "tag"],
                                 predicates=preds).collect()]
        order = F.col("tsv").desc() if descending else F.col("tsv").asc()
        want = [tuple(r) for r in
                src_df.filter(cond).orderBy(order, F.col("event_id").asc())
                .limit(20).select("event_id", "tsv", "tag").collect()]
        assert got == want, preds


def test_topk_predicate_pruning_still_tight(spark, clustered):
    """On a ts-clustered store, a filtered top-k still prunes buckets: the
    cutoff derived from predicate-proven buckets plus predicate zone maps
    keeps the bucket read-set a strict subset."""
    meta, nonempty = engine._plan_store(clustered)
    from pyspark.sql import types as T
    by_name = {f.name: f.dataType.simpleString()
               for f in T.StructType.fromJson(meta["spark_schema"]).fields}
    # an always-true range predicate on the cluster column keeps every
    # bucket all-match, so the cutoff math is unchanged vs unfiltered
    preds = engine._normalize_predicates({"tsv": (0, 10**9)}, by_name)
    full, partial, _ = engine._classify_records(nonempty, preds)
    assert not partial  # all proven -> cutoff uses every bucket
    stats = [(int(r["columns"]["tsv"]["min"]),
              int(r["columns"]["tsv"]["max"]),
              int(r["n_rows"])) for r in full]
    cut = engine._topk_cutoff(stats, 25, True)
    surviving = [1 for lo, hi, _ in stats if hi >= cut]
    assert 0 < len(surviving) < len(stats)


@pytest.mark.parametrize("descending", [True, False])
def test_topk_float_order_column(spark, src_df, salted, descending):
    """Round-4: float order columns sort/prune through their monotone
    int64 order keys — Spark parity pinned on the decoded store."""
    got = [tuple(r) for r in
           engine.topk_table(spark, salted, "score", 15,
                             descending=descending, tie_col="event_id",
                             columns=["event_id", "score"]).collect()]
    order = F.col("score").desc() if descending else F.col("score").asc()
    want = [tuple(r) for r in
            src_df.orderBy(order, F.col("event_id").asc()).limit(15)
            .select("event_id", "score").collect()]
    assert got == want


def test_topk_float_nan_zero_inf(spark, tmp_path_factory):
    """Adversarial float ordering: every NaN pattern sorts as the single
    largest value, -0.0 ties +0.0 (broken by the tie column), infs at the
    ends — exactly Spark's ORDER BY semantics."""
    rows = [(0, float("nan")), (1, 0.0), (2, -0.0), (3, float("inf")),
            (4, float("-inf")), (5, float("nan")), (6, 1.5), (7, -1.5),
            (8, 0.0), (9, -0.0)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = str(tmp_path_factory.mktemp("topkf")) + "/store"
    engine.run_encode(spark, df, out, buckets=2, salt_col="id")
    for descending in (True, False):
        for k in (3, 6, 10):
            got = [(r["id"], repr(r["v"])) for r in
                   engine.topk_table(spark, out, "v", k,
                                     descending=descending, tie_col="id",
                                     columns=["id", "v"]).collect()]
            order = F.col("v").desc() if descending else F.col("v").asc()
            want = [(r["id"], repr(r["v"])) for r in
                    df.orderBy(order, F.col("id").asc()).limit(k).collect()]
            assert got == want, (descending, k)


def test_topk_plan_reports_pruning(spark, clustered):
    """jobs/query.py --explain surface (round-5, next #8): the driver-side
    plan report shows the cutoff pruning with zero task I/O."""
    plan = engine.topk_plan(clustered, "tsv", 25, descending=True)
    assert plan["buckets_total"] == 16
    assert 0 < plan["buckets_read"] < plan["buckets_total"]
    assert plan["buckets_full"] == plan["buckets_read"]  # no predicates

    # with a predicate, boundary buckets surface as masked
    plan2 = engine.topk_plan(clustered, "tsv", 25, descending=True,
                             predicates={"tag": ("eq", "t1")})
    assert plan2["buckets_read"] == plan2["buckets_full"] + plan2["buckets_masked"]
    assert plan2["buckets_read"] <= plan["buckets_total"]
