"""Exact percentile / median routing (flowforge/sqlagg.py round-5 final
stretch): ``median(n_chars)`` / ``percentile(n_chars, p)`` ride the
composite group kernel as an extra GROUP BY dimension — one metadata
kernel pass yields O(groups x ndv) (value, count) combo rows, and the
finishing reproduces Spark's own interpolated percentile over them
(sort by value, cumulative counts, value-at-floor/ceil of p*(N-1), the
identical double arithmetic), so the median-doc-length-per-language
audit at 10^12 rows never decodes non-predicate columns row-wise.

Every routed statement must match plain spark.sql on rows AND column
types; fallbacks must be row-identical with named reasons. The fixture
salts NULLs into the percentile column (SQL percentile skips them) and
keeps a NULL group value.
"""

import numpy as np
import pytest

from flowforge import engine, sqlagg

ROWS = 2500


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    rng = np.random.default_rng(17)
    rows = []
    for i in range(ROWS):
        n_chars = (None if rng.random() < 0.08
                   else int(rng.integers(0, 3000)))
        rows.append((
            int(i),
            ["en", "de", "fr", None][int(rng.integers(0, 4))],
            f"src{int(rng.integers(0, 10))}/item{i}",
            n_chars,
        ))
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long")
    out = str(tmp_path_factory.mktemp("pctl")) + "/store"
    engine.run_encode(spark, df, out, buckets=8, salt_col="source")
    return out


ROUTABLE = [
    # global and per-group median (NULL values skipped, NULL group kept)
    "SELECT median(n_chars) AS med FROM docs",
    "SELECT lang, median(n_chars) AS med FROM docs GROUP BY lang",
    # quartiles + count in one pass; interpolation between order stats
    "SELECT lang, percentile(n_chars, 0.25) AS q1, "
    "percentile(n_chars, 0.75) AS q3, count(*) AS c "
    "FROM docs GROUP BY lang",
    # other aggregates on OTHER columns ride the same kernel pass
    "SELECT lang, median(n_chars) AS med, min(doc_id) AS mn, "
    "avg(doc_id) AS av FROM docs WHERE n_chars > 500 GROUP BY lang",
    # composite keys + HAVING over the median + ORDER BY/LIMIT
    "SELECT lang, source, median(n_chars) AS med FROM docs "
    "GROUP BY lang, source HAVING median(n_chars) > 1000 "
    "ORDER BY med DESC, lang, source LIMIT 5",
    # derived scalar group key
    "SELECT upper(lang) AS L, median(n_chars) AS med FROM docs "
    "GROUP BY upper(lang)",
    # boundary percentages = exact min/max order stats
    "SELECT percentile(n_chars, 1.0) AS mx, percentile(n_chars, 0.0) "
    "AS mn FROM docs",
    # arithmetic over percentile outputs (hidden slots)
    "SELECT median(n_chars) - percentile(n_chars, 0.25) AS spread "
    "FROM docs",
    # WHERE that eliminates every row: NULL median, zero count
    "SELECT median(n_chars) AS med, count(*) AS c FROM docs "
    "WHERE n_chars > 99999999",
    # percentile of one column grouped by another plain column
    "SELECT lang, median(doc_id) AS m, count(n_chars) AS nn "
    "FROM docs GROUP BY lang",
    # ORDER BY the median (hidden-sort shape works over pctl outputs)
    "SELECT lang FROM docs GROUP BY lang "
    "ORDER BY median(n_chars) DESC LIMIT 2",
]

FALLBACK = [
    # double column: the combo dimension is integral-only
    ("SELECT lang, percentile(doc_id + 0.5, 0.5) AS m FROM docs "
     "GROUP BY lang", None),
    # the percentile column cannot double as a value-agg column
    ("SELECT lang, median(n_chars) AS m, sum(n_chars) AS s FROM docs "
     "GROUP BY lang", "percentile column reused"),
    # one combo dimension only
    ("SELECT median(n_chars) AS m, median(doc_id) AS m2 FROM docs",
     "several percentile columns"),
    # array of percentages changes the output type
    ("SELECT lang, percentile(n_chars, array(0.5, 0.9)) AS ps "
     "FROM docs GROUP BY lang", "percentile with an array of percentages"),
    # cross-column OR composition would multiply combo rows
    ("SELECT median(n_chars) AS m FROM docs "
     "WHERE lang = 'en' OR n_chars > 2000",
     "percentile under cross-column OR"),
    # grouping sets re-aggregation of combo rows is not composed
    ("SELECT lang, median(n_chars) AS m FROM docs GROUP BY ROLLUP(lang)",
     "percentile under grouping sets"),
]


def _both(spark, store, sql):
    fast = sqlagg.store_agg_sql(spark, sql, {"docs": store})
    slow = spark.sql(sql)
    return fast, slow


@pytest.mark.parametrize("sql", ROUTABLE)
def test_percentile_routable_match_spark(spark, store, sql):
    r = sqlagg.route_agg_sql(spark, sql, {"docs": store})
    assert r is not None, sql
    assert any(spec[0] == "pctl" for spec in r["aggs"].values()), sql
    fast, slow = _both(spark, store, sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields], sql
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


@pytest.mark.parametrize("sql,reason", FALLBACK)
def test_percentile_fallback_still_correct(spark, store, sql, reason):
    r, got_reason = sqlagg.route_agg_sql_reason(spark, sql, {"docs": store})
    assert r is None, sql
    if reason is not None:
        assert got_reason == reason, sql
    fast, slow = _both(spark, store, sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


def test_percentile_route_shape(spark, store):
    """The routed dict carries the pctl spec and the predicates still
    reach the kernel pass (pruning intact under the combo dimension)."""
    sql = ("SELECT lang, median(n_chars) AS med FROM docs "
           "WHERE source LIKE 'src1%' GROUP BY lang")
    r = sqlagg.route_agg_sql(spark, sql, {"docs": store})
    assert r is not None
    assert r["aggs"]["med"] == ("pctl", "n_chars", 0.5) \
        or r["aggs"]["med"] == ["pctl", "n_chars", 0.5]
    assert r["predicates"]
    stats = sqlagg.route_pruning_stats(r)
    assert stats["buckets_total"] >= stats["buckets_read"] >= 0


def test_percentile_matches_independent_derivation(spark, store):
    """Golden check against a pure-Python weighted percentile (not
    Spark): pin the interpolation itself, not just Spark parity."""
    from flowforge import datasource

    sql = "SELECT lang, percentile(n_chars, 0.3) AS p FROM docs GROUP BY lang"
    got = {tuple(r) for r in
           sqlagg.store_agg_sql(spark, sql, {"docs": store}).collect()}
    rows = datasource._load(spark, store, None, pushdown=True) \
        .select("lang", "n_chars").collect()
    by_lang: dict = {}
    for lang, v in rows:
        if v is not None:
            by_lang.setdefault(lang, []).append(v)
    exp = set()
    for lang, vals in by_lang.items():
        vals.sort()
        pos = 0.3 * (len(vals) - 1)
        lo, hi = int(np.floor(pos)), int(np.ceil(pos))
        if lo == hi:
            p = float(vals[lo])
        else:
            p = vals[lo] * (hi - pos) + vals[hi] * (pos - lo)
        exp.add((lang, p))
    assert got == exp
