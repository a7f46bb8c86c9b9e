"""Joined-statement routing (flowforge/sqlagg.py, late round 5).

``store JOIN dim`` aggregates route as: one grouped kernel pass keyed on
the store-side join keys (metadata/codec kernels, full pruning stack),
a BROADCAST inner equi-join of those O(ndv) partials against the dim
subplan, and one re-merge groupBy on the final keys — the store never
shuffles raw rows. Every statement here runs routed AND as plain
spark.sql over the same views and must agree on rows and schema,
including the inner-join subtleties the composition must reproduce:
duplicate dim keys multiply row counts, NULL keys never match, dim rows
without matches vanish.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flowforge import engine, sqlagg

ROWS = 2000


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    import datetime
    rng = np.random.default_rng(11)
    rows = [
        (
            int(i),
            ["en", "de", "fr", None][int(rng.integers(0, 4))],
            f"src{int(rng.integers(0, 5))}",
            int(rng.integers(0, 1000)),
            float(rng.standard_normal()),
            datetime.datetime(2024, 1, 1)
            + datetime.timedelta(hours=int(rng.integers(0, 2000))),
        )
        for i in range(ROWS)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n long, "
              "score double, ts timestamp")
    out = str(tmp_path_factory.mktemp("joinroute")) + "/store"
    engine.run_encode(spark, df, out, buckets=4, salt_col="source")
    return out


@pytest.fixture(scope="module")
def dims(spark):
    # ``dim``: unique keys, one key ('zz') matching nothing, one store
    # lang (None and 'fr') without a dim row; a NAME-COLLIDING ``lang``
    # column (the natural ON s.lang = d.lang spelling)
    spark.createDataFrame(
        [("en", "west", 1.0), ("de", "east", 2.0), ("zz", "north", 9.9)],
        "lang string, region string, w double",
    ).createOrReplaceTempView("dim")
    # ``dimdup``: duplicate join keys (en x2) — inner-join multiplicity —
    # plus a NULL key row, which SQL equality never matches
    spark.createDataFrame(
        [("en", "west"), ("en", "west2"), ("de", "east"), (None, "void")],
        "lang string, region string",
    ).createOrReplaceTempView("dimdup")
    # ``dim2``: two-column join key
    spark.createDataFrame(
        [("en", "src0", "hot"), ("de", "src1", "cold"),
         ("fr", "src2", "cold")],
        "lang string, source string, label string",
    ).createOrReplaceTempView("dim2")
    # ``dimw``: NULL payload values — count(d.w) must skip them, and the
    # 'solo' group (only null w) must yield sum NULL / count 0
    spark.createDataFrame(
        [("en", "x", None), ("en", "x", 2.5), ("de", "y", 4.0),
         ("fr", "solo", None)],
        "lang string, region string, w double",
    ).createOrReplaceTempView("dimw")


ROUTED = [
    # grouped by a dim payload column, WHERE on the store side
    "SELECT d.region AS region, count(*) AS cnt, sum(s.n) AS t, "
    "min(s.doc_id) AS md FROM docs s JOIN dim d ON s.lang = d.lang "
    "WHERE s.n > 100 GROUP BY d.region ORDER BY region",
    # cross-column OR on the store side (round-5 final stretch): the
    # inclusion-exclusion passes compose per kernel-key group BEFORE
    # the broadcast dim join — additive, extremes, dim aggregates,
    # outer joins, ungrouped, and three branches all compose
    "SELECT d.region, count(*) AS c, sum(s.n) AS sn FROM docs s "
    "JOIN dim d ON s.lang = d.lang WHERE s.n > 500 OR s.source = 'src1' "
    "GROUP BY d.region",
    "SELECT d.region, min(s.n) AS mn, max(s.n) AS mx FROM docs s "
    "JOIN dim d ON s.lang = d.lang WHERE s.n > 900 OR s.doc_id < 50 "
    "GROUP BY d.region",
    "SELECT d.region, sum(d.w) AS sw, avg(d.w) AS aw, count(*) AS c "
    "FROM docs s JOIN dim d ON s.lang = d.lang "
    "WHERE s.n > 500 OR s.source = 'src1' GROUP BY d.region",
    "SELECT count(*) AS c, sum(s.n) AS sn FROM docs s JOIN dim d "
    "ON s.lang = d.lang WHERE s.n > 500 OR s.source = 'src1'",
    "SELECT d.region, count(*) AS c FROM docs s LEFT JOIN dim d "
    "ON s.lang = d.lang WHERE s.n > 500 OR s.source = 'src1' "
    "GROUP BY d.region",
    "SELECT d.region, s.lang, count(*) AS c FROM docs s JOIN dim d "
    "ON s.lang = d.lang WHERE s.n > 500 OR s.source = 'src1' "
    "OR s.doc_id < 20 GROUP BY d.region, s.lang",
    # store + dim keys mixed, HAVING + avg + ORDER BY
    "SELECT s.source, d.region, count(*) AS cnt, avg(s.n) AS a "
    "FROM docs s JOIN dim d ON s.lang = d.lang "
    "GROUP BY s.source, d.region HAVING count(*) > 20 "
    "ORDER BY s.source, d.region",
    # ungrouped global aggregate over the join
    "SELECT count(*) AS c, sum(s.n) AS t, max(s.n) AS mx, "
    "count(s.source) AS nc FROM docs s JOIN dim d ON s.lang = d.lang",
    # dim key that IS the join key (reads the equal store column)
    "SELECT d.lang, count(*) AS c FROM docs s JOIN dim d "
    "ON s.lang = d.lang GROUP BY d.lang ORDER BY d.lang",
    # store on the RIGHT side of the JOIN
    "SELECT d.region, count(*) AS c FROM dim d JOIN docs s "
    "ON d.lang = s.lang GROUP BY d.region ORDER BY d.region",
    # duplicate dim keys multiply counts; NULL dim keys match nothing
    "SELECT d.region, count(*) AS c, sum(s.n) AS t FROM docs s "
    "JOIN dimdup d ON s.lang = d.lang GROUP BY d.region ORDER BY d.region",
    "SELECT count(*) AS c FROM docs s JOIN dimdup d ON s.lang = d.lang",
    # two-column equi-join
    "SELECT d.label, count(*) AS c, sum(s.n) AS t FROM docs s JOIN dim2 d "
    "ON s.lang = d.lang AND s.source = d.source "
    "GROUP BY d.label ORDER BY d.label",
    # inline VALUES dim — no registered view at all
    "SELECT d.region, count(*) AS c FROM docs s JOIN "
    "(VALUES ('en', 'west'), ('de', 'east')) AS d(lang, region) "
    "ON s.lang = d.lang GROUP BY d.region ORDER BY d.region",
    # filtered/projected subquery dim (the dim-side WHERE lives INSIDE)
    "SELECT d.region, count(*) AS c FROM docs s JOIN "
    "(SELECT lang, region FROM dim WHERE w >= 1.0) d "
    "ON s.lang = d.lang GROUP BY d.region ORDER BY d.region",
    # arithmetic over aggregates + ORDER BY a hidden aggregate + LIMIT
    "SELECT d.region, sum(s.n)/count(*) AS avg_n FROM docs s "
    "JOIN dim d ON s.lang = d.lang GROUP BY d.region "
    "ORDER BY count(*) DESC LIMIT 2",
    # no visible aggregate: which joined combinations exist
    "SELECT s.source, d.region FROM docs s JOIN dim d ON s.lang = d.lang "
    "GROUP BY s.source, d.region ORDER BY s.source, d.region",
    # dim-side WHERE conjuncts push INTO the dim subplan pre-broadcast
    "SELECT count(*) AS c FROM docs s JOIN dim d ON s.lang = d.lang "
    "WHERE d.w > 1",
    # dim-side aggregates re-derive from the cnt partials: sum = cnt*w
    # re-added, count skips nulls, min/max read matched values, avg =
    # the quotient — beside store aggs in the same statement
    "SELECT d.region, sum(d.w) AS sw, count(d.w) AS cw, min(d.w) AS mw, "
    "max(d.w) AS xw, avg(d.w) AS aw, count(*) AS c, sum(s.n) AS sn "
    "FROM docs s JOIN dimw d ON s.lang = d.lang "
    "GROUP BY d.region ORDER BY d.region",
    # ungrouped dim aggs; the all-null 'solo' dim rows via lang='fr'
    "SELECT sum(d.w) AS sw, count(d.w) AS cw, max(d.w) AS xw "
    "FROM docs s JOIN dimw d ON s.lang = d.lang",
    # a dim agg over a STRING column (min/max work on any orderable type)
    "SELECT min(d.region) AS mr, count(*) AS c FROM docs s "
    "JOIN dim d ON s.lang = d.lang",
    # duplicate dim keys weight the dim aggs by inner-join multiplicity
    # (1.5D: a bare 1.5 is DECIMAL, which is a named dim-agg fallback)
    "SELECT sum(d.w) AS sw FROM docs s JOIN "
    "(SELECT lang, 1.5D AS w FROM dimdup) d ON s.lang = d.lang",
    # arithmetic MIXING the sides: store aggs and dim aggs both become
    # hidden routed slots the expression rebuilds over
    "SELECT d.region, sum(s.n)/sum(d.w) AS q, sum(d.w)*2 AS dq "
    "FROM docs s JOIN dim d ON s.lang = d.lang "
    "GROUP BY d.region ORDER BY d.region",
    # HAVING and ORDER BY over non-selected dim aggregates (Catalyst's
    # hidden-output machinery flows through the dim-agg parse)
    "SELECT d.region, count(*) AS c FROM docs s JOIN dim d "
    "ON s.lang = d.lang GROUP BY d.region HAVING sum(d.w) > 10",
    "SELECT d.region, count(*) AS c FROM docs s JOIN dim d "
    "ON s.lang = d.lang GROUP BY d.region ORDER BY sum(d.w), d.region",
    # whitelisted scalar fn over a dim agg, ungrouped
    "SELECT round(avg(d.w), 2) AS r FROM docs s JOIN dim d "
    "ON s.lang = d.lang",
    # ONE count(distinct store col) composes with the join: the distinct
    # source rides the kernel pass as a combo dimension; dim-key
    # multiplicity duplicates combo rows but never VALUES (dimdup)
    "SELECT d.region, count(distinct s.source) AS ds, count(*) AS c "
    "FROM docs s JOIN dim d ON s.lang = d.lang "
    "GROUP BY d.region ORDER BY d.region",
    "SELECT count(distinct s.source) AS ds FROM docs s JOIN dimdup d "
    "ON s.lang = d.lang",
    # distinct over the join key itself, and over an expression
    "SELECT d.region, count(distinct s.lang) AS dl FROM docs s "
    "JOIN dim d ON s.lang = d.lang GROUP BY d.region ORDER BY d.region",
    "SELECT count(distinct concat(s.lang, s.source)) AS dc "
    "FROM docs s JOIN dim d ON s.lang = d.lang",
    # count(distinct) beside dim aggs and store-side WHERE
    "SELECT d.region, count(distinct s.source) AS ds, sum(d.w) AS sw "
    "FROM docs s JOIN dim d ON s.lang = d.lang "
    "WHERE s.n > 100 GROUP BY d.region ORDER BY d.region",
    # a store key re-aliased to the distinct source's name does NOT
    # shadow: group outputs keep their column names until the final
    # projection
    "SELECT s.lang AS source, count(distinct concat(s.source, 'x')) AS ds "
    "FROM docs s JOIN dim d ON s.lang = d.lang GROUP BY s.lang "
    "ORDER BY source",
    # TIME-derived store keys derive IN the kernel pass: the
    # docs-per-day-per-region corpus audit
    "SELECT to_date(s.ts) AS day, d.region, count(*) AS c "
    "FROM docs s JOIN dim d ON s.lang = d.lang "
    "GROUP BY to_date(s.ts), d.region ORDER BY day, d.region",
    "SELECT year(s.ts) AS y, count(*) AS c, sum(d.w) AS sw "
    "FROM docs s JOIN dim d ON s.lang = d.lang GROUP BY year(s.ts)",
    "SELECT date_trunc('week', s.ts) AS wk, count(distinct s.source) AS ds "
    "FROM docs s JOIN dim d ON s.lang = d.lang "
    "GROUP BY date_trunc('week', s.ts) ORDER BY wk",
    # store-preserving OUTER joins (the enrichment join): unmatched
    # store groups keep NULL dim columns — fr/None langs survive with
    # region NULL, and the dim join key is read from the DIM side (NULL
    # for unmatched, unlike the inner-join store-side shortcut)
    "SELECT d.region, count(*) AS c, sum(s.n) AS t FROM docs s "
    "LEFT JOIN dim d ON s.lang = d.lang GROUP BY d.region "
    "ORDER BY d.region",
    "SELECT d.lang, count(*) AS c FROM docs s LEFT JOIN dim d "
    "ON s.lang = d.lang GROUP BY d.lang ORDER BY d.lang",
    "SELECT count(*) AS c FROM docs s LEFT JOIN dimdup d "
    "ON s.lang = d.lang",
    "SELECT d.region, count(*) AS c FROM dim d RIGHT JOIN docs s "
    "ON d.lang = s.lang GROUP BY d.region ORDER BY d.region",
    # dim aggs under a left join skip the NULL-extended rows exactly as
    # SQL does (sum/avg/count over NULL dim values)
    "SELECT d.region, sum(d.w) AS sw, count(d.w) AS cw, avg(d.w) AS aw "
    "FROM docs s LEFT JOIN dimw d ON s.lang = d.lang "
    "GROUP BY d.region ORDER BY d.region",
    "SELECT count(distinct s.source) AS ds, count(*) AS c FROM docs s "
    "LEFT JOIN dim d ON s.lang = d.lang WHERE s.n > 100",
    # both sides constrained in separate conjuncts: store side routes as
    # predicates, dim side filters the broadcast
    "SELECT d.region, count(*) AS c, sum(s.n) AS t FROM docs s "
    "JOIN dim d ON s.lang = d.lang "
    "WHERE s.n > 100 AND d.w >= 1.0 AND d.region <> 'north' "
    "GROUP BY d.region ORDER BY d.region",
]

FALLBACK = [
    # outer joins route only when the STORE side is preserved: a
    # dim-preserving outer join would emit bare rows per unmatched dim
    # key, which is not a partial composition
    ("SELECT count(*) AS c FROM dim d LEFT JOIN docs s "
     "ON d.lang = s.lang", "dim-preserving outer join"),
    ("SELECT count(*) AS c FROM docs s RIGHT JOIN dim d "
     "ON s.lang = d.lang", "dim-preserving outer join"),
    ("SELECT count(*) AS c FROM docs s FULL JOIN dim d "
     "ON s.lang = d.lang", "FULL OUTER join"),
    # a post-join dim predicate under an outer join also eliminates the
    # NULL-extended rows — not the same as filtering the broadcast
    ("SELECT count(*) AS c FROM docs s LEFT JOIN dim d "
     "ON s.lang = d.lang WHERE d.w > 1",
     "dim-side WHERE under an outer join"),
    # ONE conjunct touching both sides cannot split across the kernel
    # pass and the dim filter
    ("SELECT count(*) AS c FROM docs s JOIN dim d ON s.lang = d.lang "
     "WHERE s.n > d.w", "mixes the store and dim sides"),
    ("SELECT sum(DISTINCT d.w) AS t FROM docs s JOIN dim d "
     "ON s.lang = d.lang", "distinct aggregate"),
    # decimal sums carry exact scale arithmetic the cnt-weighted rebuild
    # does not reproduce
    ("SELECT sum(d.w) AS t FROM docs s JOIN "
     "(SELECT lang, 1.5 AS w FROM dimdup) d ON s.lang = d.lang",
     "decimal aggregate"),
    ("SELECT sum(d.w + 1) AS t FROM docs s JOIN dim d ON s.lang = d.lang",
     "over an expression"),
    # an aggregate over a MIXED-side expression surfaces the non-column
    # operand (the analyzer's cast makes it an expression either way)
    ("SELECT sum(s.n + d.w) AS t FROM docs s JOIN dim d "
     "ON s.lang = d.lang", "not a plain column"),
    # ... and embedded in arithmetic, the side-mixing is the named reason
    ("SELECT sum(s.n * d.w) + count(*) AS t FROM docs s JOIN dim d "
     "ON s.lang = d.lang", "mixes the two join sides"),
    # TWO distinct columns would need one kernel pass each plus
    # null-safe per-pass joins composed with the dim join
    ("SELECT count(distinct s.source) AS a, count(distinct s.lang) AS b "
     "FROM docs s JOIN dim d ON s.lang = d.lang",
     "several count(distinct)"),
    # the distinct source doubling as a value-agg column is the same
    # named fallback as in un-joined statements
    ("SELECT count(distinct s.n) AS a, sum(s.n) AS t FROM docs s "
     "JOIN dim d ON s.lang = d.lang", "count(distinct) column reused"),
    # a dim key output taking the distinct source's NAME would shadow it
    # (plain column: the generic reuse guard; expression: the generic
    # derived-key-shadow guard — dim keys are derived outputs)
    ("SELECT d.region AS source, count(distinct s.source) AS ds "
     "FROM docs s JOIN dim d ON s.lang = d.lang GROUP BY d.region",
     "column reused"),
    ("SELECT d.region AS source, "
     "count(distinct concat(s.source, 'x')) AS ds "
     "FROM docs s JOIN dim d ON s.lang = d.lang GROUP BY d.region",
     "shadowed by a derived key name"),
    ("SELECT count(*) AS c FROM docs s JOIN dim d ON s.n > d.w",
     "join condition"),
    ("SELECT count(*) AS c FROM docs s JOIN dim d "
     "ON s.lang = d.lang AND s.n > 1", "join condition"),
    ("SELECT count(*) AS c FROM docs s CROSS JOIN dim d", "cross"),
    # count of the join-key column itself: the kernel cannot aggregate a
    # group dimension (engine precondition — the dry-run surfaces it)
    ("SELECT count(s.lang) AS c FROM docs s JOIN dim d "
     "ON s.lang = d.lang", "agg columns must differ"),
    ("SELECT d.region, sum(s.score) AS t FROM docs s JOIN dim d "
     "ON s.lang = d.lang GROUP BY d.region", "over type double"),
    ("SELECT upper(d.region) AS r, count(*) AS c FROM docs s JOIN dim d "
     "ON s.lang = d.lang GROUP BY upper(d.region)", "derived group key"),
    # derived-SCALAR store keys (post-kernel sqlexpr rebuild) do not
    # compose with the joined finishing frame; time-derived keys DO
    ("SELECT upper(s.lang) AS ul, count(*) AS c FROM docs s JOIN dim d "
     "ON s.lang = d.lang GROUP BY upper(s.lang)",
     "derived scalar group key"),
    # dim key aliased to a kernel partial name collides in the finishing
    ("SELECT d.region AS cnt, count(*) AS c FROM docs s JOIN dim d "
     "ON s.lang = d.lang GROUP BY d.region", "collides"),
    # a second store in the statement — never broadcast a chunk store
    ("SELECT count(*) AS c FROM docs s JOIN docs t ON s.doc_id = t.doc_id",
     "two stores"),
    # grouping sets over a join
    ("SELECT d.region, count(*) AS c FROM docs s JOIN dim d "
     "ON s.lang = d.lang GROUP BY ROLLUP(d.region)", "relation Join"),
    # count(distinct) does not compose with OR inside a join (the
    # sign-weighted combo union and dim multiplicity would interact)
    ("SELECT d.region, count(DISTINCT s.source) AS ds FROM docs s "
     "JOIN dim d ON s.lang = d.lang WHERE s.n > 900 OR s.source = 'src1' "
     "GROUP BY d.region",
     "count(distinct) under cross-column OR in a joined statement"),
]


def _both(spark, store, sql):
    fast = sqlagg.store_agg_sql(spark, sql, {"docs": store})
    slow = spark.sql(sql)
    return fast, slow


def _rows_match(fast, slow):
    """Sorted row-set equality, floats compared to 9 significant digits:
    a double sum's value depends on partial ordering, which differs
    between the two plans run-to-run."""
    def norm(df):
        return sorted(
            tuple(f"{v:.9g}" if isinstance(v, float) else repr(v)
                  for v in row)
            for row in map(tuple, df.collect())
        )
    return norm(fast) == norm(slow)


@pytest.mark.parametrize("sql", ROUTED)
def test_joined_statements_route_and_match_spark(spark, store, dims, sql):
    r = sqlagg.route_agg_sql(spark, sql, {"docs": store})
    assert r is not None and r.get("join") is not None
    fast, slow = _both(spark, store, sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields]
    assert _rows_match(fast, slow)


@pytest.mark.parametrize("sql,why", FALLBACK)
def test_joined_fallbacks_are_correct(spark, store, dims, sql, why):
    r, reason = sqlagg.route_agg_sql_reason(spark, sql, {"docs": store})
    assert r is None
    assert why.lower() in (reason or "").lower()
    fast, slow = _both(spark, store, sql)
    assert _rows_match(fast, slow)


def test_empty_dim_and_unmatched_store(spark, store, dims):
    spark.createDataFrame([], "lang string, region string") \
        .createOrReplaceTempView("dimempty")
    for sql in (
        "SELECT count(*) AS c, sum(s.n) AS t FROM docs s "
        "JOIN dimempty d ON s.lang = d.lang",
        "SELECT d.region, count(*) AS c FROM docs s "
        "JOIN dimempty d ON s.lang = d.lang GROUP BY d.region",
    ):
        assert sqlagg.route_agg_sql(spark, sql, {"docs": store}) is not None
        fast, slow = _both(spark, store, sql)
        assert _rows_match(fast, slow)


def test_join_route_shape_and_pruning_stats(spark, store, dims):
    sql = ("SELECT d.region, count(*) AS cnt FROM docs s "
           "JOIN dim d ON s.lang = d.lang WHERE s.n > 100 "
           "GROUP BY d.region")
    r = sqlagg.route_agg_sql(spark, sql, {"docs": store})
    assert r["join"]["pairs"] == [("lang", 0)]
    assert r["join"]["kernel_keys"] == ["lang"]
    assert r["predicates"]  # the store-side WHERE routed as predicates
    stats = sqlagg.route_pruning_stats(r)
    assert stats["buckets_total"] >= stats["buckets_read"] >= 0
    # the dim side broadcasts: the physical plan must carry a broadcast
    # exchange and exactly ONE shuffle exchange (the final-key re-merge)
    df = sqlagg.store_agg_sql(spark, sql, {"docs": store})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= 1, plan


def test_join_multiplicity_exact(spark, store, dims):
    # duplicate dim keys are the easy thing to get wrong: each store row
    # with lang='en' must count TWICE through dimdup — pin the arithmetic
    # against an independent derivation, not just plan-vs-plan
    en = ROWS_BY_LANG(spark, store)
    sql = ("SELECT count(*) AS c FROM docs s JOIN dimdup d "
           "ON s.lang = d.lang")
    fast = sqlagg.store_agg_sql(spark, sql, {"docs": store})
    assert fast.collect()[0][0] == 2 * en["en"] + en["de"]


def ROWS_BY_LANG(spark, store):
    from flowforge import datasource
    datasource.register(spark)
    df = datasource._load(spark, store, None, pushdown=True)
    return {r["lang"]: r["c"] for r in
            df.groupBy("lang").agg(F.count("*").alias("c")).collect()}
