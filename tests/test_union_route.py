"""UNION [ALL] routing (flowforge/sqlagg.py round-5 final stretch) and
the self-referencing-statement pushdown guard.

Each UNION branch routes independently through the metadata kernels with
its own pruning stack; the results union positionally (first branch's
names win — Spark's Union semantics) and plain UNION dedupes with
Spark's own distinct. Branches the analyzer wraps in cast projections
(type-coerced unions) fall back row-identically.

The guard: a statement referencing ONE pushdown view more than once
(self-union, self-join) is unsafe on the scan path — Spark 4.1.2's
python-data-source execution reuses one reader state for identical
relations, so one branch silently read the other's pruned rows (a live
wrong-results bug found while routing unions; the routed path was
correct and the scan path was not). store_sql and store_agg_sql's
fallback now detect multi-reference statements and re-register
full-decode views; pinned here against an independently decoded frame.
"""

import numpy as np
import pytest

from flowforge import datasource, engine, sqlagg

ROWS = 2000


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    rng = np.random.default_rng(23)
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
    out = str(tmp_path_factory.mktemp("unionroute")) + "/store"
    engine.run_encode(spark, df, out, buckets=8, salt_col="source")
    return out


ROUTABLE = [
    # period/filter comparison: two grouped branches, different WHEREs
    "SELECT lang, count(*) AS c FROM docs WHERE n_chars > 2000 "
    "GROUP BY lang UNION ALL "
    "SELECT lang, count(*) AS c FROM docs WHERE source LIKE 'src1%' "
    "GROUP BY lang",
    # tagged one-row counts (literal outputs beside the aggregates)
    "SELECT 'big' AS tag, count(*) AS c FROM docs WHERE n_chars > 2000 "
    "UNION ALL "
    "SELECT 'src1' AS tag, count(*) AS c FROM docs "
    "WHERE source LIKE 'src1%'",
    # plain UNION = Spark's own distinct over the combined groups
    "SELECT lang, count(*) AS c FROM docs GROUP BY lang UNION "
    "SELECT lang, count(*) AS c FROM docs GROUP BY lang",
    # three branches, mixed shapes (grouped x2 + ungrouped tagged)
    "SELECT lang, count(*) AS c FROM docs GROUP BY lang UNION ALL "
    "SELECT source, count(*) FROM docs GROUP BY source UNION ALL "
    "SELECT 'all', count(*) FROM docs",
    # ORDER BY / LIMIT over the union
    "SELECT lang, count(*) AS c FROM docs WHERE n_chars > 2000 "
    "GROUP BY lang UNION ALL "
    "SELECT lang, count(*) FROM docs WHERE n_chars <= 2000 "
    "GROUP BY lang ORDER BY c DESC, lang LIMIT 4",
    # EXCEPT / INTERSECT ride the same per-branch routing; the combining
    # op is Spark's own subtract/exceptAll/intersect/intersectAll
    "SELECT lang FROM docs WHERE n_chars > 2000 GROUP BY lang EXCEPT "
    "SELECT lang FROM docs WHERE source LIKE 'src1%' GROUP BY lang",
    "SELECT DISTINCT lang FROM docs INTERSECT "
    "SELECT DISTINCT lang FROM docs WHERE n_chars > 4000",
    "SELECT lang, count(*) AS c FROM docs GROUP BY lang EXCEPT ALL "
    "SELECT lang, count(*) AS c FROM docs WHERE n_chars >= 0 "
    "GROUP BY lang",
    "SELECT DISTINCT source FROM docs WHERE lang = 'en' INTERSECT ALL "
    "SELECT DISTINCT source FROM docs WHERE lang = 'de'",
    "SELECT lang FROM docs GROUP BY lang EXCEPT SELECT lang FROM docs "
    "WHERE n_chars > 100 GROUP BY lang ORDER BY lang LIMIT 3",
]

FALLBACK = [
    # type-coerced branches: the analyzer wraps casts above a branch,
    # which the branch recursion rejects (projection over non-outputs)
    "SELECT lang, count(*) AS c FROM docs GROUP BY lang UNION ALL "
    "SELECT lang, avg(n_chars) FROM docs GROUP BY lang",
]


def _slow(spark, store, sql):
    # expected side on a full-decode view: always correct, including for
    # statements that reference the store several times
    engine.decode_table(spark, store).createOrReplaceTempView("docs")
    return spark.sql(sql)


@pytest.mark.parametrize("sql", ROUTABLE)
def test_union_routable_match_spark(spark, store, sql):
    r = sqlagg.route_agg_sql(spark, sql, {"docs": store})
    assert r is not None and r.get("kind") == "union", sql
    fast = sqlagg.store_agg_sql(spark, sql, {"docs": store})
    slow = _slow(spark, store, sql)
    assert fast.columns == slow.columns, sql
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields], sql
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


@pytest.mark.parametrize("sql", FALLBACK)
def test_union_fallback_still_correct(spark, store, sql):
    assert sqlagg.route_agg_sql(spark, sql, {"docs": store}) is None
    fast = sqlagg.store_agg_sql(spark, sql, {"docs": store})
    slow = _slow(spark, store, sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


def test_union_pruning_stats_sum_branches(spark, store):
    sql = ("SELECT lang, count(*) AS c FROM docs WHERE n_chars > 4500 "
           "GROUP BY lang UNION ALL SELECT lang, count(*) AS c FROM docs "
           "GROUP BY lang")
    r = sqlagg.route_agg_sql(spark, sql, {"docs": store})
    assert r is not None and len(r["subs"]) == 2
    stats = sqlagg.route_pruning_stats(r)
    assert stats["passes"] == 2
    assert stats["buckets_total"] \
        == 2 * sqlagg.route_pruning_stats(r["subs"][0])["buckets_total"]


# --- the self-reference pushdown guard (live bug regression) -----------

SELF_REF = [
    # the original reproduction: branch 1 used to return branch 2's count
    "SELECT 'big' AS tag, count(*) AS c FROM docs WHERE n_chars > 2000 "
    "UNION ALL SELECT 'src1' AS tag, count(*) AS c FROM docs "
    "WHERE source LIKE 'src1%'",
    # self-join with different filters on each side (never routable)
    "SELECT count(*) AS c FROM docs a JOIN docs b ON a.doc_id = b.doc_id "
    "WHERE a.n_chars > 2000 AND b.source LIKE 'src1%'",
]


@pytest.mark.parametrize("sql", SELF_REF)
def test_self_reference_fallback_is_correct(spark, store, sql):
    """store_sql AND store_agg_sql's fallback must agree with a
    full-decode execution when one store is referenced twice."""
    slow = sorted(map(repr, map(tuple, _slow(spark, store, sql).collect())))
    via_sql = datasource.store_sql(spark, sql, {"docs": store})
    assert sorted(map(repr, map(tuple, via_sql.collect()))) == slow, sql
    via_agg = sqlagg.store_agg_sql(spark, sql, {"docs": store})
    assert sorted(map(repr, map(tuple, via_agg.collect()))) == slow, sql


def test_max_store_refs_counts(spark, store):
    datasource.register(spark)
    datasource._load(spark, store, None,
                     pushdown=True).createOrReplaceTempView("docs")
    one = spark.sql("SELECT count(*) FROM docs WHERE n_chars > 10")
    two = spark.sql(
        "SELECT count(*) FROM docs WHERE n_chars > 10 UNION ALL "
        "SELECT count(*) FROM docs WHERE n_chars < 5")
    assert datasource.max_store_refs(
        one._jdf.queryExecution().analyzed()) == 1
    assert datasource.max_store_refs(
        two._jdf.queryExecution().analyzed()) == 2
