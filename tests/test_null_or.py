"""IS [NOT] NULL + OR predicate pushdown, end to end (round-5 verdict,
next #5).

The commit records and chunk metas have carried per-column null counts
since format v6; these tests pin that the decode/aggregate/SQL surfaces
now USE them:

1. decode_table predicates: "isnull" / "notnull" / ("or", [forms...])
   return exactly Spark's own filter results on a null-bearing store;
2. pruning is metadata-real: "isnull" prunes buckets with zero nulls
   driver-side, "notnull" on a never-null column is an all-match proof
   (count_plan classifies every bucket full — zero task I/O);
3. spark.sql over the Data Source consumes IS [NOT] NULL exactly;
4. the SQL aggregate router routes WHERE ... OR ... IS NULL
   (single-column) AND cross-column OR, ungrouped and grouped (round 5:
   inclusion-exclusion over conjunctive passes; grouped shapes compose
   per group through a null-safe outer join), all row-identical to
   ordinary execution.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flowforge import datasource, engine, sqlagg  # noqa: E402

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def null_src(spark, tmp_path_factory):
    """documents with lang nulled where it was 'en' (some buckets all
    non-null, so isnull has something to prune) and n_chars nulled on a
    doc_id stripe (int-typed null predicates). lang-sorted into small row
    groups so direct-mode buckets get disjoint lang zones (the null rows
    cluster together -> observable null pruning)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nullsrc")
    path = str(d / "docs.parquet")
    t = pq.read_table(DOCS)
    lang = pc.if_else(pc.equal(t.column("lang"), "en"),
                      pa.scalar(None, pa.string()), t.column("lang"))
    doc_id = t.column("doc_id")
    n_chars = pc.if_else(pc.equal(pc.bit_wise_and(doc_id, 7), 0),
                         pa.scalar(None, t.schema.field("n_chars").type),
                         t.column("n_chars"))
    t = t.set_column(t.schema.get_field_index("lang"), "lang", lang)
    t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars", n_chars)
    t = t.take(pc.sort_indices(t, sort_keys=[("lang", "ascending")]))
    pq.write_table(t, path, row_group_size=64)
    return path


@pytest.fixture(scope="module")
def null_store(spark, null_src, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nullstore") / "store")
    engine.run_encode_path(spark, null_src, out, target_rows=64,
                           chunk_rows=32)
    return out


def _same(got, want):
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_decode_isnull_notnull(spark, null_src, null_store):
    src = spark.read.parquet(null_src)
    got = engine.decode_table(spark, null_store,
                              predicates={"lang": "isnull"})
    _same(got, src.filter(F.col("lang").isNull()))
    assert got.count() > 0

    got2 = engine.decode_table(spark, null_store,
                               predicates={"lang": "notnull"})
    _same(got2, src.filter(F.col("lang").isNotNull()))

    got3 = engine.decode_table(spark, null_store,
                               predicates={"n_chars": "isnull"})
    _same(got3, src.filter(F.col("n_chars").isNull()))


def test_decode_or_forms(spark, null_src, null_store):
    src = spark.read.parquet(null_src)
    got = engine.decode_table(
        spark, null_store,
        predicates={"lang": ("or", [("eq", "de"), "isnull"])})
    _same(got, src.filter((F.col("lang") == "de") | F.col("lang").isNull()))
    assert got.count() > 0

    # or-of-ranges on an int column (branches may overlap)
    got2 = engine.decode_table(
        spark, null_store,
        predicates={"n_chars": ("or", [(0, 200), (1000, 10**9)])})
    _same(got2, src.filter(((F.col("n_chars") >= 0) & (F.col("n_chars") <= 200))
                           | (F.col("n_chars") >= 1000)))

    # or mixing membership and null on strings
    got3 = engine.decode_table(
        spark, null_store,
        predicates={"source": ("or", [("in", ["src1", "src2"]),
                                      ("prefix", "src3")])})
    _same(got3, src.filter(F.col("source").isin("src1", "src2")
                           | F.col("source").startswith("src3")))


def test_isnull_prunes_buckets_and_notnull_proves_full(null_store):
    meta, nonempty = engine._plan_store(null_store)
    from pyspark.sql import types as T
    by_name = {f.name: f.dataType.simpleString()
               for f in T.StructType.fromJson(meta["spark_schema"]).fields}

    # lang-sorted store: buckets whose lang values are all non-null exist
    # and must be pruned driver-side by the isnull spec
    preds = engine._normalize_predicates({"lang": "isnull"}, by_name)
    kept = engine._prune_buckets(nonempty, preds)
    assert 0 < len(kept) < len(nonempty)

    # doc_id never has nulls -> notnull is a free all-match proof: every
    # bucket answers a count from the commit record, zero task I/O
    plan = engine.count_plan(null_store, {"doc_id": "notnull"})
    assert plan["partial"] == [] and plan["pruned"] == []
    assert plan["full_rows"] == sum(int(r["n_rows"]) for r in nonempty)

    # ... and isnull on it prunes everything
    plan2 = engine.count_plan(null_store, {"doc_id": "isnull"})
    assert plan2["full"] == [] and plan2["partial"] == []


def test_store_sql_null_filters(spark, null_src, null_store):
    src = spark.read.parquet(null_src)
    got = datasource.store_sql(
        spark, "SELECT doc_id, lang FROM docs WHERE lang IS NULL",
        stores={"docs": null_store},
        columns={"docs": ["doc_id", "lang"]})
    _same(got, src.filter(F.col("lang").isNull()).select("doc_id", "lang"))

    got2 = datasource.store_sql(
        spark,
        "SELECT doc_id FROM docs WHERE lang IS NOT NULL AND lang = 'de'",
        stores={"docs": null_store},
        columns={"docs": ["doc_id", "lang"]})
    _same(got2, src.filter(F.col("lang") == "de").select("doc_id"))

    # contradiction short-circuits to empty without error
    got3 = datasource.store_sql(
        spark, "SELECT doc_id FROM docs WHERE lang IS NULL AND lang = 'de'",
        stores={"docs": null_store},
        columns={"docs": ["doc_id", "lang"]})
    assert got3.count() == 0


def test_sqlagg_routes_or_isnull(spark, null_src, null_store):
    stores = {"docs": null_store}
    sql = ("SELECT count(*) AS cnt FROM docs "
           "WHERE lang = 'de' OR lang IS NULL")
    r = sqlagg.route_agg_sql(spark, sql, stores)
    assert r is not None and r["predicates"]["lang"][0] == "or"
    got = sqlagg.store_agg_sql(spark, sql, stores).collect()
    want = (spark.read.parquet(null_src)
            .filter((F.col("lang") == "de") | F.col("lang").isNull())
            .count())
    assert got[0]["cnt"] == want > 0

    # grouped + OR range on ints routes too
    sql2 = ("SELECT source, count(*) AS cnt FROM docs "
            "WHERE n_chars <= 200 OR n_chars >= 1000 "
            "GROUP BY source")
    assert sqlagg.route_agg_sql(spark, sql2, stores) is not None
    got2 = sqlagg.store_agg_sql(spark, sql2, stores).orderBy("source").collect()
    want2 = (spark.read.parquet(null_src)
             .filter((F.col("n_chars") <= 200) | (F.col("n_chars") >= 1000))
             .groupBy("source").agg(F.count("*").alias("cnt"))
             .orderBy("source").collect())
    assert got2 == want2

    # ungrouped cross-column OR routes too (round 5: inclusion-exclusion
    # over three conjunctive metadata passes), row-identical on a
    # null-bearing store (NULL lang/source rows are non-matches on both
    # branches AND on the A-and-B pass — IE stays exact)
    sql3 = ("SELECT count(*) AS cnt FROM docs "
            "WHERE lang = 'de' OR source = 'src2'")
    r3 = sqlagg.route_agg_sql(spark, sql3, stores)
    assert r3 is not None and r3.get("orx") is not None
    got3 = sqlagg.store_agg_sql(spark, sql3, stores).collect()
    want3 = (spark.read.parquet(null_src)
             .filter((F.col("lang") == "de") | (F.col("source") == "src2"))
             .count())
    assert got3[0]["cnt"] == want3

    # GROUPED cross-column OR on the null-bearing store: the NULL lang
    # group is a real SQL group — the per-group composition joins the
    # branch passes NULL-SAFELY, so it must come back as ONE row, not
    # one per pass
    sql4 = ("SELECT lang, count(*) AS cnt FROM docs "
            "WHERE n_chars <= 200 OR source = 'src2' GROUP BY lang")
    r4 = sqlagg.route_agg_sql(spark, sql4, stores)
    assert r4 is not None and r4.get("orx") is not None
    got4 = sorted(map(tuple, sqlagg.store_agg_sql(spark, sql4, stores)
                      .collect()), key=repr)
    want4 = sorted(map(tuple, (
        spark.read.parquet(null_src)
        .filter((F.col("n_chars") <= 200) | (F.col("source") == "src2"))
        .groupBy("lang").agg(F.count("*").alias("cnt"))
        .collect())), key=repr)
    assert got4 == want4
    assert any(t[0] is None for t in got4)  # the NULL group composed once


def test_sqlagg_count_distinct_null_groups(spark, null_src, null_store):
    """Late-round-5 COUNT(DISTINCT) widenings on the null-bearing store:
    the multi-distinct pass join must be NULL-SAFE (the NULL lang group
    composes once, carrying both distinct counts), distinct counts over
    a null-bearing VALUE column exclude NULL exactly as SQL does, and
    the OR-composed combo rows keep those semantics per group."""
    stores = {"docs": null_store}
    src = spark.read.parquet(null_src)

    # MULTIPLE count(distinct) columns beside the agg family: one
    # composite pass each, per-group results joined null-safely
    sql = ("SELECT lang, count(DISTINCT source) AS a, "
           "count(DISTINCT n_chars) AS b, avg(doc_id) AS av "
           "FROM docs GROUP BY lang")
    assert sqlagg.route_agg_sql(spark, sql, stores) is not None
    got = sorted(map(tuple, sqlagg.store_agg_sql(spark, sql, stores)
                     .collect()), key=repr)
    want = sorted(map(tuple, (
        src.groupBy("lang").agg(
            F.count_distinct("source").alias("a"),
            F.count_distinct("n_chars").alias("b"),
            F.avg("doc_id").alias("av"))
        .collect())), key=repr)
    assert got == want
    assert any(t[0] is None for t in got)  # NULL group joined once

    # count(distinct <null-bearing col>) + min under a cross-column OR:
    # sign-composed combo rows, distinct count and min read the branch
    # passes only; NULL n_chars values never count, all-null groups
    # yield NULL min
    sql2 = ("SELECT lang, count(DISTINCT n_chars) AS d, "
            "min(doc_id) AS mn FROM docs "
            "WHERE n_chars <= 200 OR source = 'src2' GROUP BY lang")
    r2 = sqlagg.route_agg_sql(spark, sql2, stores)
    assert r2 is not None and r2.get("orx") is not None
    got2 = sorted(map(tuple, sqlagg.store_agg_sql(spark, sql2, stores)
                      .collect()), key=repr)
    want2 = sorted(map(tuple, (
        src.filter((F.col("n_chars") <= 200) | (F.col("source") == "src2"))
        .groupBy("lang").agg(
            F.count_distinct("n_chars").alias("d"),
            F.min("doc_id").alias("mn"))
        .collect())), key=repr)
    assert got2 == want2
    assert any(t[0] is None for t in got2)

    # count(distinct) under ROLLUP on the null store: the grouping id
    # keeps the real NULL lang group distinct from the subtotal row
    sql3 = ("SELECT lang, grouping_id() AS g, "
            "count(DISTINCT source) AS d FROM docs "
            "GROUP BY ROLLUP(lang)")
    r3 = sqlagg.route_agg_sql(spark, sql3, stores)
    assert r3 is not None and r3.get("gsets")
    got3 = sorted(map(tuple, sqlagg.store_agg_sql(spark, sql3, stores)
                      .collect()), key=repr)
    want3 = sorted(map(tuple, (
        src.rollup("lang").agg(F.grouping_id().alias("g"),
                               F.count_distinct("source").alias("d"))
        .select("lang", "g", "d")
        .collect())), key=repr)
    assert got3 == want3
    # both the real NULL group (g=0) and the subtotal (g=1) present
    assert any(t[0] is None and t[1] == 0 for t in got3)
    assert any(t[0] is None and t[1] == 1 for t in got3)

    # MULTIPLE count(distinct) under ROLLUP (late round 5): the extra
    # pass joins per (grouping id, keys) null-safely, so the real NULL
    # lang group and the subtotal row each compose exactly once, each
    # carrying BOTH distinct counts
    sql4 = ("SELECT lang, grouping_id() AS g, "
            "count(DISTINCT source) AS a, count(DISTINCT n_chars) AS b "
            "FROM docs GROUP BY ROLLUP(lang)")
    r4 = sqlagg.route_agg_sql(spark, sql4, stores)
    assert r4 is not None and r4.get("gsets")
    got4 = sorted(map(tuple, sqlagg.store_agg_sql(spark, sql4, stores)
                      .collect()), key=repr)
    want4 = sorted(map(tuple, (
        src.rollup("lang").agg(F.grouping_id().alias("g"),
                               F.count_distinct("source").alias("a"),
                               F.count_distinct("n_chars").alias("b"))
        .select("lang", "g", "a", "b")
        .collect())), key=repr)
    assert got4 == want4
    assert sum(1 for t in got4 if t[0] is None) == 2  # g=0 and g=1, once
