"""FILTER (WHERE ...) aggregate clauses (flowforge/sqlagg.py round-5
final stretch) — and the silent-wrong-results regression that motivated
them: the router used to parse ``count(*) FILTER (WHERE lang = 'en')``
as a plain count(*), silently dropping the condition (the filtered
count returned the unfiltered total). Now every AggregateExpression
parse point rejects an unhandled FILTER clause, and plain select items
ROUTE it: the base pass computes the group frame + unfiltered outputs
under the statement WHERE, each filtered aggregate runs its own kernel
pass under WHERE AND filter (pruned independently), and null-safe left
joins compose the outputs — count 0 / sum NULL for a group whose filter
matches nothing, exactly Spark's semantics.

Expected sides run on an independently decoded frame (pushdown-free),
so these tests cannot inherit a scan-path bug.
"""

import numpy as np
import pytest

from flowforge import engine, sqlagg

ROWS = 2200


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    rng = np.random.default_rng(29)
    rows = [
        (
            int(i),
            ["en", "de", "fr", None][int(rng.integers(0, 4))],
            f"src{int(rng.integers(0, 10))}/item{i}",
            int(rng.integers(0, 5000)),
        )
        for i in range(ROWS)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long")
    out = str(tmp_path_factory.mktemp("filteragg")) + "/store"
    engine.run_encode(spark, df, out, buckets=8, salt_col="source")
    return out


ROUTABLE = [
    # the original reproduction (was silently wrong before the guard)
    "SELECT count(*) FILTER (WHERE lang = 'en') AS en, "
    "count(*) FILTER (WHERE n_chars > 2000) AS big, count(*) AS total "
    "FROM docs",
    # grouped, beside an unfiltered count
    "SELECT lang, count(*) FILTER (WHERE n_chars > 2000) AS big, "
    "count(*) AS c FROM docs GROUP BY lang",
    # two filtered aggregates, different functions and filters
    "SELECT lang, sum(n_chars) FILTER (WHERE source LIKE 'src1%') AS s1, "
    "avg(n_chars) FILTER (WHERE n_chars > 1000) AS a1 "
    "FROM docs GROUP BY lang",
    # near-empty filter: count 0 (never NULL) for unmatched groups
    "SELECT lang, count(*) FILTER (WHERE n_chars > 4999) AS rare "
    "FROM docs GROUP BY lang",
    # every aggregate filtered, ungrouped (the probe-count path)
    "SELECT count(*) FILTER (WHERE n_chars > 2000) AS big FROM docs",
    # composes with WHERE + composite keys + HAVING + ORDER BY/LIMIT
    "SELECT lang, source, min(doc_id) FILTER (WHERE n_chars > 2500) AS m "
    "FROM docs WHERE n_chars > 500 GROUP BY lang, source "
    "HAVING count(*) > 5 ORDER BY lang, source LIMIT 8",
    # derived scalar group key
    "SELECT upper(lang) AS L, count(*) FILTER (WHERE n_chars > 2000) "
    "AS big FROM docs GROUP BY upper(lang)",
    # window function over the filtered output
    "SELECT lang, count(*) FILTER (WHERE n_chars > 2000) AS big, "
    "rank() OVER (ORDER BY count(*) FILTER (WHERE n_chars > 2000) DESC, "
    "lang) AS r FROM docs GROUP BY lang",
    # same-column OR inside the filter is a plain constraint
    "SELECT count(*) FILTER (WHERE lang = 'en' OR lang = 'de') AS ed "
    "FROM docs",
]

FALLBACK = [
    ("SELECT count(DISTINCT source) FILTER (WHERE lang = 'en') AS d "
     "FROM docs", "FILTER clause on a cntd aggregate"),
    ("SELECT count(*) FILTER (WHERE lang = 'en' OR n_chars > 4000) AS c "
     "FROM docs", "cross-column OR inside a FILTER clause"),
    ("SELECT lang, count(*) FILTER (WHERE n_chars > 100) AS c "
     "FROM docs GROUP BY ROLLUP(lang)",
     "FILTER clause under grouping sets"),
    # unselected GROUP BY keys: the composition joins on SELECTED group
    # outputs only, so these would multiply rows if routed (review fix)
    ("SELECT count(*) FILTER (WHERE n_chars > 2000) AS big FROM docs "
     "GROUP BY lang", "FILTER clause with an unselected group key"),
    ("SELECT lang, count(*) FILTER (WHERE n_chars > 2000) AS big "
     "FROM docs GROUP BY lang, source",
     "FILTER clause with an unselected group key"),
    # FILTER on a window aggregate is rejected by Spark's own analyzer,
    # so the defensive window-parse guard has no SQL-reachable case
]


def _slow(spark, store, sql):
    engine.decode_table(spark, store).createOrReplaceTempView("docs")
    return spark.sql(sql)


@pytest.mark.parametrize("sql", ROUTABLE)
def test_filter_agg_routable_match_spark(spark, store, sql):
    r = sqlagg.route_agg_sql(spark, sql, {"docs": store})
    assert r is not None and r.get("faggs"), sql
    fast = sqlagg.store_agg_sql(spark, sql, {"docs": store})
    slow = _slow(spark, store, sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields], sql
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


@pytest.mark.parametrize("sql,reason", FALLBACK)
def test_filter_agg_fallback_still_correct(spark, store, sql, reason):
    r, got_reason = sqlagg.route_agg_sql_reason(spark, sql, {"docs": store})
    assert r is None, sql
    if reason is not None:
        assert got_reason == reason, sql
    fast = sqlagg.store_agg_sql(spark, sql, {"docs": store})
    slow = _slow(spark, store, sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


def test_filter_agg_never_drops_the_condition(spark, store):
    """The regression itself: the filtered count must differ from the
    total (the bug returned the total for both)."""
    sql = ("SELECT count(*) FILTER (WHERE lang = 'en') AS en, "
           "count(*) AS total FROM docs")
    row = sqlagg.store_agg_sql(spark, sql, {"docs": store}).collect()[0]
    assert 0 < row["en"] < row["total"]


def test_filter_agg_passes_prune_independently(spark, store):
    """Each filtered pass carries its own merged predicates in the
    route dict (statement WHERE AND the filter)."""
    sql = ("SELECT lang, count(*) FILTER (WHERE n_chars > 4000) AS big "
           "FROM docs WHERE n_chars > 100 GROUP BY lang")
    r = sqlagg.route_agg_sql(spark, sql, {"docs": store})
    assert r is not None
    (inner, fpreds), = r["faggs"].values()
    assert inner == ["count"]
    assert fpreds["n_chars"][0] == 4001  # intersected lower bound
    assert r["predicates"]["n_chars"][0] == 101
    stats = sqlagg.route_pruning_stats(r)
    assert stats["passes"] == 2  # base + one per filtered aggregate
    assert stats["buckets_total"] >= 1
