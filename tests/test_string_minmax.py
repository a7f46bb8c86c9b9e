"""String MIN/MAX routing (flowforge/sqlagg.py round-5 final stretch):
``min(source)`` / ``max(source)`` over a string column ride the
composite group kernel as a combo dimension — one metadata pass yields
the per-group value sets and Spark's own null-skipping extremes finish
over them, so "alphabetically first source per language" never decodes
rows outside the kernel. Shares the percentile branch's dimension slot
(finished outputs carry internal fin-frame names so a user alias like
``mn`` cannot collide with the kernel partial of the same name — pinned
here). Expected sides run on an independently decoded frame.
"""

import numpy as np
import pytest

from flowforge import engine, sqlagg

ROWS = 2200


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    rng = np.random.default_rng(31)
    rows = []
    for i in range(ROWS):
        src = (None if rng.random() < 0.05
               else f"src{int(rng.integers(0, 10))}/item{i}")
        rows.append((
            int(i),
            ["en", "de", "fr", None][int(rng.integers(0, 4))],
            src,
            int(rng.integers(0, 5000)),
        ))
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long")
    out = str(tmp_path_factory.mktemp("strmm")) + "/store"
    engine.run_encode(spark, df, out, buckets=8, salt_col="doc_id")
    return out


ROUTABLE = [
    "SELECT min(source) AS mn, max(source) AS mx FROM docs",
    "SELECT lang, min(source) AS mn, max(source) AS mx, count(*) AS c "
    "FROM docs GROUP BY lang",
    # the alias "mn" matches a kernel partial name — the internal
    # fin-frame naming keeps the finishing unambiguous (review-class pin)
    "SELECT lang, min(source) AS mn, sum(n_chars) AS s, "
    "avg(n_chars) AS a FROM docs WHERE n_chars > 500 GROUP BY lang",
    # the string column doubling as the group key
    "SELECT lang, max(lang) AS same FROM docs GROUP BY lang",
    # derived scalar group key
    "SELECT upper(lang) AS L, min(source) AS mn FROM docs "
    "GROUP BY upper(lang)",
    # HAVING over the string extreme + ORDER BY
    "SELECT lang, min(source) AS mn FROM docs GROUP BY lang "
    "HAVING min(source) > 'src1' ORDER BY lang",
    # composes with FILTER aggregates on other columns
    "SELECT min(source) AS mn, "
    "count(*) FILTER (WHERE n_chars > 2000) AS big FROM docs",
]

FALLBACK = [
    ("SELECT min(source) AS a, min(lang) AS b FROM docs",
     "several string min/max columns"),
    ("SELECT lang, min(source) AS mn, median(n_chars) AS med FROM docs "
     "GROUP BY lang", "string min/max beside percentile"),
    ("SELECT min(source) AS mn, count(source) AS c FROM docs",
     "string min/max column reused"),
    ("SELECT min(source) AS mn FROM docs "
     "WHERE lang = 'en' OR n_chars > 4000",
     "string min/max under cross-column OR"),
    ("SELECT lang, min(source) AS mn FROM docs GROUP BY ROLLUP(lang)",
     "string min/max under grouping sets"),
]


def _slow(spark, store, sql):
    engine.decode_table(spark, store).createOrReplaceTempView("docs")
    return spark.sql(sql)


@pytest.mark.parametrize("sql", ROUTABLE)
def test_string_minmax_routable_match_spark(spark, store, sql):
    r = sqlagg.route_agg_sql(spark, sql, {"docs": store})
    assert r is not None and r.get("strmm"), sql
    fast = sqlagg.store_agg_sql(spark, sql, {"docs": store})
    slow = _slow(spark, store, sql)
    assert [f.dataType for f in fast.schema.fields] \
        == [f.dataType for f in slow.schema.fields], sql
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


@pytest.mark.parametrize("sql,reason", FALLBACK)
def test_string_minmax_fallback_still_correct(spark, store, sql, reason):
    r, got_reason = sqlagg.route_agg_sql_reason(spark, sql, {"docs": store})
    assert r is None, sql
    assert got_reason == reason, sql
    fast = sqlagg.store_agg_sql(spark, sql, {"docs": store})
    slow = _slow(spark, store, sql)
    assert sorted(map(repr, map(tuple, fast.collect()))) \
        == sorted(map(repr, map(tuple, slow.collect()))), sql


def test_string_minmax_null_skipping(spark, store):
    """SQL min/max skip NULLs; an all-null group yields NULL (the
    fixture salts ~5% NULL sources)."""
    sql = "SELECT lang, min(source) AS mn FROM docs GROUP BY lang"
    got = {tuple(r) for r in
           sqlagg.store_agg_sql(spark, sql, {"docs": store}).collect()}
    rows = engine.decode_table(spark, store) \
        .select("lang", "source").collect()
    by_lang: dict = {}
    for lang, s in rows:
        by_lang.setdefault(lang, [])
        if s is not None:
            by_lang[lang].append(s)
    exp = {(lang, min(v) if v else None) for lang, v in by_lang.items()}
    assert got == exp
