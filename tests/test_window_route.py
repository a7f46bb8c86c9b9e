"""Window functions OVER routed aggregates (flowforge/sqlagg.py round-5
final stretch): ``count(*) / sum(count(*)) OVER ()`` share-of-corpus,
``rank() OVER (ORDER BY count(*) DESC)`` volume ranking, running totals,
lag deltas — the aggregate part answers from chunk/commit metadata
(kernel partials, full pruning stack) and the Window node stack rebuilds
with pyspark's own Window/F functions over the O(groups) routed frame.

Every routed statement runs THREE ways (store_agg_sql, plain spark.sql,
the route dry-run) and must agree on rows AND column types; fallbacks
must be row-identical with a named reason. Mirrors the matrix style of
tests/test_sqlagg.py.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity helpers)

from flowforge import engine, sqlagg

ROWS = 2400


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    rng = np.random.default_rng(11)
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
    out = str(tmp_path_factory.mktemp("winroute")) + "/store"
    engine.run_encode(spark, df, out, buckets=8, salt_col="source")
    return out


ROUTABLE = [
    # the share-of-corpus audit: window aggregate over the routed counts
    "SELECT lang, count(*) AS c, "
    "count(*) / sum(count(*)) OVER () AS share FROM docs GROUP BY lang",
    # ranking by volume (hidden _w0 operand injected by the analyzer)
    "SELECT lang, count(*) AS c, "
    "rank() OVER (ORDER BY count(*) DESC) AS r FROM docs GROUP BY lang",
    # PARTITION BY a group key + multi-key window ordering
    "SELECT lang, source, count(*) AS c, row_number() OVER "
    "(PARTITION BY lang ORDER BY count(*) DESC, source) AS rn "
    "FROM docs GROUP BY lang, source",
    # explicit ROWS frame with literal bounds
    "SELECT lang, count(*) AS c, sum(count(*)) OVER "
    "(ORDER BY lang ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS run "
    "FROM docs GROUP BY lang",
    # RANGE default frame with an aggregate window function
    "SELECT lang, count(*) AS c, avg(sum(n_chars)) OVER "
    "(ORDER BY lang RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "AS ra FROM docs GROUP BY lang",
    # lag/lead deltas over the per-group counts (cast default included)
    "SELECT lang, count(*) AS c, "
    "lag(count(*), 1) OVER (ORDER BY lang) AS prev FROM docs GROUP BY lang",
    "SELECT lang, count(*) AS c, lead(count(*), 2, -1) OVER "
    "(ORDER BY lang) AS nxt FROM docs GROUP BY lang",
    # composes with WHERE pushdown + ORDER BY/LIMIT over window outputs
    "SELECT lang, count(*) AS c, rank() OVER (ORDER BY count(*) DESC) "
    "AS r FROM docs WHERE n_chars > 500 GROUP BY lang ORDER BY r, lang "
    "LIMIT 3",
    # composes with HAVING (filter runs before the window, Spark's order)
    "SELECT lang, count(*) AS c, rank() OVER (ORDER BY count(*) DESC) "
    "AS r FROM docs GROUP BY lang HAVING count(*) > 50",
    # two rankers sharing one spec + ntile bucketing
    "SELECT lang, cume_dist() OVER (ORDER BY sum(n_chars)) AS cd, "
    "percent_rank() OVER (ORDER BY sum(n_chars)) AS pr "
    "FROM docs GROUP BY lang",
    "SELECT lang, ntile(2) OVER (ORDER BY count(*)) AS nt "
    "FROM docs GROUP BY lang",
    # post-window scalar arithmetic (the mid projection's sqlexpr rebuild)
    "SELECT lang, round(100.0 * count(*) / sum(count(*)) OVER (), 2) "
    "AS pct FROM docs GROUP BY lang ORDER BY pct DESC, lang",
    # count(distinct) child route + window over its output
    "SELECT lang, count(DISTINCT source) AS d, rank() OVER "
    "(ORDER BY count(DISTINCT source) DESC, lang) AS r "
    "FROM docs GROUP BY lang",
    # cross-column OR child route + window over the composed counts
    "SELECT lang, count(*) AS c, rank() OVER (ORDER BY count(*) DESC, "
    "lang) AS r FROM docs WHERE lang = 'en' OR n_chars > 4000 "
    "GROUP BY lang",
    # two DIFFERENT window specs (stacked Catalyst Window nodes)
    "SELECT lang, source, count(*) AS c, "
    "rank() OVER (PARTITION BY lang ORDER BY count(*) DESC, source) AS r, "
    "sum(count(*)) OVER (PARTITION BY lang) AS lang_total "
    "FROM docs GROUP BY lang, source",
    # window operand over an expression-over-aggregates output
    "SELECT lang, sum(n_chars) / count(*) AS mean_chars, rank() OVER "
    "(ORDER BY sum(n_chars) / count(*) DESC, lang) AS r "
    "FROM docs GROUP BY lang",
    # PARTITION BY a scalar expression over the group key: the analyzer
    # injects upper(lang) as an Aggregate output, which the existing
    # scalar-over-group-key route already evaluates
    "SELECT lang, count(*) AS c, sum(count(*)) OVER "
    "(PARTITION BY upper(lang)) AS s FROM docs GROUP BY lang",
    # first_value / last_value / nth_value over the ordered groups
    "SELECT lang, count(*) AS c, first_value(count(*)) OVER "
    "(ORDER BY lang) AS fv, last_value(count(*)) OVER (ORDER BY lang "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv "
    "FROM docs GROUP BY lang",
    "SELECT lang, nth_value(count(*), 2) OVER (ORDER BY lang) AS nv "
    "FROM docs GROUP BY lang",
]

FALLBACK = [
    # row-level window (no aggregate below — O(n) rows, not routable)
    "SELECT doc_id, rank() OVER (ORDER BY n_chars) AS r FROM docs",
    # non-whitelisted scalar over an aggregate output beside the window
    "SELECT lang, count(*) AS c, sha2(cast(count(*) AS string), 256) "
    "AS h, rank() OVER (ORDER BY count(*)) AS r FROM docs GROUP BY lang",
    # window output name collides with a group column (case-insensitive
    # final select would be ambiguous)
    "SELECT lang, count(*) AS c, rank() OVER (ORDER BY count(*)) AS LANG "
    "FROM docs GROUP BY lang",
]


def _both(spark, store, sql):
    fast = sqlagg.store_agg_sql(spark, sql, {"docs": store})
    slow = spark.sql(sql)
    return fast, slow


@pytest.mark.parametrize("sql", ROUTABLE)
def test_window_routable_match_spark(spark, store, sql):
    r = sqlagg.route_agg_sql(spark, sql, {"docs": store})
    assert r is not None and r.get("window"), sql
    fast, slow = _both(spark, store, sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields], sql
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


@pytest.mark.parametrize("sql", FALLBACK)
def test_window_fallback_still_correct(spark, store, sql):
    assert sqlagg.route_agg_sql(spark, sql, {"docs": store}) is None
    fast, slow = _both(spark, store, sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


def test_window_route_shape(spark, store):
    """The route dict carries the parsed window stack + mid projection,
    the child aggregate's pruning machinery intact underneath."""
    sql = ("SELECT lang, count(*) AS c, "
           "count(*) / sum(count(*)) OVER () AS share "
           "FROM docs WHERE n_chars > 500 GROUP BY lang")
    r = sqlagg.route_agg_sql(spark, sql, {"docs": store})
    assert r is not None
    wins = r["window"]["wins"]
    assert len(wins) == 1 and len(wins[0]) == 1
    w = wins[0][0]
    assert w["fn"][0] == "agg" and w["fn"][1] == "sum"
    assert w["frame"] == ["rows", "up", "uf"]
    assert w["part"] == [] and w["order"] == []
    # mid projection: two passthroughs + the share division as sqlexpr
    kinds = [e[0] for e in r["window"]["mid"]]
    assert kinds.count("sqlexpr") == 1
    # child predicates still route (pruning stats work unchanged)
    assert r["predicates"], "WHERE should reach the kernel pass"
    stats = sqlagg.route_pruning_stats(r)
    assert stats["buckets_total"] >= stats["buckets_read"] >= 0


def test_window_fallback_reason_is_named(spark, store):
    _, reason = sqlagg.route_agg_sql_reason(
        spark,
        "SELECT lang, count(*) AS c, rank() OVER (ORDER BY count(*)) "
        "AS LANG FROM docs GROUP BY lang",
        {"docs": store})
    assert reason == "window output 'LANG' collides with an existing column"
