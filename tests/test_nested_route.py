"""Two-level aggregation routing (flowforge/sqlagg.py round-5 final
stretch): ``SELECT avg(c) FROM (SELECT count(*) AS c ... GROUP BY lang)``
— the aggregate-of-an-aggregate corpus audit ("average docs per
language", group-size maxima, "how many groups exceed N"). The subquery
routes through the kernel partials with the full pruning stack; the
outer aggregation is pyspark's own groupBy().agg() over the
O(inner-groups) routed frame, so values and types match Spark's fallback
exactly. Matrix style mirrors tests/test_sqlagg.py.
"""

import numpy as np
import pytest

from flowforge import engine, sqlagg

ROWS = 2400


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    rng = np.random.default_rng(13)
    rows = [
        (
            int(i),
            ["en", "de", "fr", None][int(rng.integers(0, 4))],
            f"src{int(rng.integers(0, 12))}/item{i}",
            int(rng.integers(0, 5000)),
        )
        for i in range(ROWS)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long")
    out = str(tmp_path_factory.mktemp("nested")) + "/store"
    engine.run_encode(spark, df, out, buckets=8, salt_col="source")
    return out


ROUTABLE = [
    # average docs per language — THE aggregate-of-aggregate audit
    "SELECT avg(c) AS a, max(c) AS m FROM "
    "(SELECT count(*) AS c FROM docs GROUP BY lang)",
    # outer GROUP BY over an inner group key
    "SELECT source, avg(c) AS a FROM (SELECT source, count(*) AS c "
    "FROM docs GROUP BY lang, source) GROUP BY source",
    # outer WHERE over inner outputs ("how many languages exceed N")
    "SELECT count(*) AS n_big FROM (SELECT lang, count(*) AS c "
    "FROM docs GROUP BY lang) WHERE c > 60",
    # the same filter spelled as the subquery's HAVING
    "SELECT count(*) AS n FROM (SELECT lang, count(*) AS c "
    "FROM docs GROUP BY lang HAVING count(*) > 60)",
    # inner WHERE pushdown + outer ORDER BY/LIMIT + renamed group key
    "SELECT lang AS l, max(c) AS m FROM (SELECT lang, source, count(*) "
    "AS c FROM docs WHERE n_chars > 100 GROUP BY lang, source) "
    "GROUP BY lang ORDER BY m DESC, l LIMIT 3",
    # outer count(distinct) over an inner aggregate output
    "SELECT count(DISTINCT c) AS d FROM "
    "(SELECT lang, count(*) AS c FROM docs GROUP BY lang)",
    # window subquery under an outer aggregate
    "SELECT avg(share) AS a FROM (SELECT lang, "
    "count(*) / sum(count(*)) OVER () AS share FROM docs GROUP BY lang)",
    # outer HAVING over the outer aggregate
    "SELECT max(c) AS m FROM (SELECT count(*) AS c FROM docs "
    "GROUP BY lang, source) HAVING max(c) > 1",
    # inner count(distinct) + avg/min/sum family outer
    "SELECT min(d) AS mn, sum(d) AS s FROM (SELECT lang, "
    "count(DISTINCT source) AS d FROM docs GROUP BY lang)",
    # inner composite key + derived scalar key
    "SELECT avg(c) AS a FROM (SELECT substring(source, 1, 4) AS s4, "
    "count(*) AS c FROM docs GROUP BY substring(source, 1, 4))",
    # ORDER BY a hidden outer aggregate (Project(Sort(Aggregate)) peel
    # flows through — review fix: final_after_order threads to _finish)
    "SELECT c FROM (SELECT lang, count(*) AS c FROM docs GROUP BY lang) "
    "GROUP BY c ORDER BY count(*) DESC, c LIMIT 3",
]

FALLBACK = [
    # non-whitelisted outer aggregate
    "SELECT stddev(c) AS s FROM "
    "(SELECT count(*) AS c FROM docs GROUP BY lang)",
    # outer aggregate over an expression of inner outputs
    "SELECT avg(c * 2) AS a FROM "
    "(SELECT count(*) AS c FROM docs GROUP BY lang)",
    # review fixes: window over a nested child (no out_cols to bind),
    # count(DISTINCT literal) is not count(*), and an outer alias
    # shadowing a groupBy column would make the finishing ambiguous
    "SELECT c, count(*) AS langs, rank() OVER (ORDER BY count(*) DESC) "
    "AS r FROM (SELECT lang, count(*) AS c FROM docs GROUP BY lang) "
    "GROUP BY c",
    "SELECT count(DISTINCT 1) AS d FROM "
    "(SELECT lang, count(*) AS c FROM docs GROUP BY lang)",
    "SELECT c AS n, count(*) AS c FROM "
    "(SELECT lang, count(*) AS c FROM docs GROUP BY lang) GROUP BY c",
]


# pure-projection subqueries peel in the SINGLE-level walk (late round
# 5): FROM (SELECT cols FROM docs WHERE ...) — column pruning commutes
# with the filters, so inner WHERE conjuncts collect like top-level ones
PROJECTED = [
    "SELECT avg(n_chars) AS a FROM "
    "(SELECT n_chars FROM docs WHERE n_chars > 100)",
    "SELECT lang, count(*) AS c FROM (SELECT lang, n_chars FROM docs) "
    "WHERE n_chars > 500 GROUP BY lang",
    # filters both inside and outside the subquery AND-combine
    "SELECT count(*) AS c FROM "
    "(SELECT doc_id FROM docs WHERE lang = 'en') WHERE doc_id > 100",
    "SELECT DISTINCT lang FROM "
    "(SELECT lang FROM docs WHERE n_chars > 2000)",
    "SELECT lang, median(n_chars) AS m FROM "
    "(SELECT lang, n_chars FROM docs) GROUP BY lang",
]

PROJECTED_FALLBACK = [
    # renames would bind by the wrong name in the walk — stay fallbacks
    "SELECT avg(n) AS a FROM (SELECT n_chars AS n FROM docs)",
    "SELECT avg(n2) AS a FROM (SELECT n_chars + 1 AS n2 FROM docs)",
]


@pytest.mark.parametrize("sql", PROJECTED)
def test_projected_subquery_routes(spark, store, sql):
    r = sqlagg.route_agg_sql(spark, sql, {"docs": store})
    assert r is not None and r.get("kind") != "nested", sql
    fast, slow = _both(spark, store, sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields], sql
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


@pytest.mark.parametrize("sql", PROJECTED_FALLBACK)
def test_projected_subquery_fallbacks(spark, store, sql):
    assert sqlagg.route_agg_sql(spark, sql, {"docs": store}) is None
    fast, slow = _both(spark, store, sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


def _both(spark, store, sql):
    fast = sqlagg.store_agg_sql(spark, sql, {"docs": store})
    slow = spark.sql(sql)
    return fast, slow


@pytest.mark.parametrize("sql", ROUTABLE)
def test_nested_routable_match_spark(spark, store, sql):
    r = sqlagg.route_agg_sql(spark, sql, {"docs": store})
    assert r is not None and r.get("kind") == "nested", sql
    fast, slow = _both(spark, store, sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields], sql
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


@pytest.mark.parametrize("sql", FALLBACK)
def test_nested_fallback_still_correct(spark, store, sql):
    assert sqlagg.route_agg_sql(spark, sql, {"docs": store}) is None
    fast, slow = _both(spark, store, sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


def test_nested_route_shape_and_pruning(spark, store):
    """The nested dict carries the routed inner (predicates intact) and
    pruning stats delegate to it."""
    sql = ("SELECT avg(c) AS a FROM (SELECT lang, count(*) AS c "
           "FROM docs WHERE n_chars > 500 GROUP BY lang)")
    r = sqlagg.route_agg_sql(spark, sql, {"docs": store})
    assert r is not None and r["kind"] == "nested"
    assert r["inner"]["predicates"], "inner WHERE should reach the kernel"
    stats = sqlagg.route_pruning_stats(r)
    assert stats["buckets_total"] >= stats["buckets_read"] >= 0


def test_nested_fallback_reason_is_named(spark, store):
    _, reason = sqlagg.route_agg_sql_reason(
        spark,
        "SELECT stddev(c) AS s FROM "
        "(SELECT count(*) AS c FROM docs GROUP BY lang)",
        {"docs": store})
    assert reason == "outer aggregate StddevSamp"
