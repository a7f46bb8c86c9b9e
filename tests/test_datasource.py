"""SQL-surface predicate pushdown (round-3 verdict, missing #1).

The Python Data Source (`flowforge/datasource.py`) lets a user type plain
``spark.sql("... WHERE lang='en'")`` over a registered chunk store and have
the WHERE clause reach the SAME three-layer pruning the explicit
``decode_table(predicates=...)`` path uses. Pins:

1. filter translation parity: ``pushFilters`` produces exactly the
   engine-external predicate specs the explicit path takes, and yields
   non-translatable filters back to Spark;
2. driver-side bucket pruning parity: ``partitions()`` equals
   ``engine._prune_buckets`` on the same commits — chunk skips therefore
   equal the explicit path's by construction (shared decode kernel);
3. end-to-end exactness over spark.sql for eq/LIKE-prefix/int-range/
   float-range (strict bounds consumed via nextafter since round 5)/IN/
   IS [NOT] NULL, including filters the reader must NOT consume
   (cross-column OR, bounds at +-inf) — those come back right because
   Spark re-applies them;
4. the Spark 4.1.2 readInfo plan-caching hazard (module docstring of
   datasource.py): a pushdown relation reused for a second, different
   query reuses the first query's pruned plan — ``store_sql`` avoids it
   with a fresh relation per call, and the default (non-pushdown) view
   stays correct across arbitrary queries.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
)

sys.path.insert(0, "/root/repo")

from flowforge import datasource, engine  # noqa: E402
from flowforge.catalog import Manifest  # noqa: E402

DOCS = "/root/testdata/sf0.001/documents.parquet"
EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def docs_store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ds_docs") / "store")
    engine.run_encode_path(spark, DOCS, out, target_rows=128,
                           sort_col="lang", chunk_rows=64)
    return out


@pytest.fixture(scope="module")
def events_store(spark, tmp_path_factory):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("ds_events")
    # value-sorted small row groups: direct-mode buckets are contiguous
    # row-group runs, so this layout gives disjoint per-bucket value ranges
    # and driver-side pruning has something to prune
    t = pq.read_table(EVENTS)
    t = t.take(pc.sort_indices(t, sort_keys=[("value", "ascending")]))
    src = str(d / "src.parquet")
    pq.write_table(t, src, row_group_size=512)
    out = str(d / "store")
    engine.run_encode_path(spark, src, out, target_rows=512, chunk_rows=256)
    return out


def _reader(out_dir: str, columns: list[str] | None = None):
    meta = Manifest(out_dir).read_table_meta()
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(meta["spark_schema"])
    if columns:
        by = {f.name: f for f in schema.fields}
        schema = T.StructType([by[c] for c in columns])
    return datasource.ChunkStoreReader(out_dir, schema, {"pushdown": "true"})


# --- 1. filter translation parity -----------------------------------------


def test_pushfilters_translates_specs(docs_store):
    r = _reader(docs_store)
    remaining = list(r.pushFilters([
        EqualTo(attribute=("lang",), value="en"),
        StringStartsWith(attribute=("source",), value="src1"),
        GreaterThanOrEqual(attribute=("doc_id",), value=10),
        LessThan(attribute=("doc_id",), value=100),
        IsNotNull(attribute=("text",)),
    ]))
    # everything consumed (round 5: IS NOT NULL routes to the null-count
    # zone maps when it is the column's only constraint)
    assert remaining == []
    assert r.predicates == {
        "lang": ("eq", "en"),
        "source": ("prefix", "src1"),
        "doc_id": (10, 99),  # LessThan closes to <= value-1
        "text": "notnull",
    }
    # identical to what the explicit decode_table path normalizes
    norm = engine._normalize_predicates(r.predicates, r.by_name)
    assert set(norm) == {"lang", "source", "doc_id", "text"}
    assert norm["text"] == ("notnull",)


def test_pushfilters_contains_suffix(docs_store):
    from pyspark.sql.datasource import StringContains, StringEndsWith

    r = _reader(docs_store)
    remaining = list(r.pushFilters([
        StringContains(attribute=("source",), value="item1"),
        StringEndsWith(attribute=("text",), value="end"),
    ]))
    assert remaining == []
    assert r.predicates == {
        "source": ("contains", "item1"),
        "text": ("suffix", "end"),
    }
    # the explicit decode path normalizes the same forms
    norm = engine._normalize_predicates(r.predicates, r.by_name)
    assert norm["source"] == ("contains", [b"item1"], ["item1"])
    assert norm["text"] == ("suffix", [b"end"], ["end"])

    # one spec per column per kind: a second ANDed contains stays
    # Spark-side; an empty probe stays Spark-side
    r2 = _reader(docs_store)
    rem2 = list(r2.pushFilters([
        StringContains(attribute=("source",), value="a"),
        StringContains(attribute=("source",), value="b"),
        StringEndsWith(attribute=("text",), value=""),
    ]))
    assert len(rem2) == 2
    assert r2.predicates == {"source": ("contains", "a")}

    # priority: in > contains — the contains filter is re-yielded
    r3 = _reader(docs_store)
    rem3 = list(r3.pushFilters([
        EqualTo(attribute=("source",), value="src1/item1"),
        StringContains(attribute=("source",), value="item"),
    ]))
    assert len(rem3) == 1
    assert r3.predicates == {"source": ("eq", "src1/item1")}


def test_pushfilters_in_intersection_and_contradiction(docs_store):
    r = _reader(docs_store)
    rem = list(r.pushFilters([
        In(attribute=("lang",), value=["en", "de", "fr"]),
        In(attribute=("lang",), value=["de", "ru"]),
    ]))
    assert rem == []
    assert r.predicates == {"lang": ("eq", "de")}

    r2 = _reader(docs_store)
    list(r2.pushFilters([
        EqualTo(attribute=("lang",), value="en"),
        EqualTo(attribute=("lang",), value="de"),
    ]))
    assert r2.empty_result
    assert r2.partitions() == []


def test_pushfilters_null_specs(docs_store):
    # IS NULL alone -> consumed as the column's spec
    r = _reader(docs_store)
    f_null = IsNull(attribute=("lang",))
    f_strict = GreaterThan(attribute=("n_chars",), value=5)  # int: convertible
    rem = list(r.pushFilters([f_null, f_strict]))
    assert rem == []
    assert r.predicates == {"lang": "isnull", "n_chars": (6, (1 << 63) - 1)}

    # IS NULL AND a value constraint on the same column -> provably empty
    r2 = _reader(docs_store)
    rem2 = list(r2.pushFilters([
        IsNull(attribute=("lang",)),
        EqualTo(attribute=("lang",), value="en"),
    ]))
    assert r2.empty_result and r2.partitions() == []

    # IS NOT NULL alongside a value constraint is implied -> consumed free
    r3 = _reader(docs_store)
    rem3 = list(r3.pushFilters([
        IsNotNull(attribute=("lang",)),
        EqualTo(attribute=("lang",), value="en"),
    ]))
    assert rem3 == []
    assert r3.predicates == {"lang": ("eq", "en")}

    # IS NULL AND IS NOT NULL -> contradiction
    r4 = _reader(docs_store)
    list(r4.pushFilters([
        IsNull(attribute=("lang",)),
        IsNotNull(attribute=("lang",)),
    ]))
    assert r4.empty_result


def test_pushfilters_float_bounds(events_store):
    import math

    r = _reader(events_store)
    f_ge = GreaterThanOrEqual(attribute=("value",), value=10.0)
    f_le = LessThanOrEqual(attribute=("value",), value=25.0)
    # strict bound: consumed exactly via nextafter (round 5) — doubles are
    # discrete, so x > 1.0 == x >= nextafter(1.0, inf)
    f_gt = GreaterThan(attribute=("value",), value=1.0)
    rem = list(r.pushFilters([f_ge, f_le, f_gt]))
    assert rem == []
    lo, hi = r.predicates["value"]
    assert lo == max(10.0, math.nextafter(1.0, math.inf)) == 10.0
    assert hi == 25.0
    # strict bound at +-inf stays Spark-side (x > inf keeps NaN only)
    r2 = _reader(events_store)
    f_inf = GreaterThan(attribute=("value",), value=float("inf"))
    assert list(r2.pushFilters([f_inf])) == [f_inf]


def test_pushfilters_range_lost_to_in_is_reyielded(docs_store):
    """Priority in > range: the range filters must come back to Spark so it
    still applies them (the IN set alone is weaker)."""
    r = _reader(docs_store)
    f_in = In(attribute=("doc_id",), value=[5, 50, 500])
    f_lo = GreaterThanOrEqual(attribute=("doc_id",), value=40)
    rem = list(r.pushFilters([f_in, f_lo]))
    assert rem == [f_lo]
    assert r.predicates == {"doc_id": ("in", [5, 50, 500])}


# --- 2. driver-side bucket pruning parity ---------------------------------


def test_partitions_equal_explicit_prune(events_store):
    r = _reader(events_store)
    list(r.pushFilters([
        GreaterThanOrEqual(attribute=("value",), value=10.0),
        LessThanOrEqual(attribute=("value",), value=20.0),
    ]))
    got = sorted(p.value for p in r.partitions())

    man = Manifest(events_store)
    phash = man.read_table_meta()["plan_hash"]
    commits = [c for c in man.read_commits(phash) if int(c["n_rows"]) > 0]
    norm = engine._normalize_predicates({"value": (10.0, 20.0)}, r.by_name)
    want = sorted(engine._prune_buckets(commits, norm))
    assert got == want
    # the store is value-sorted across row-group buckets -> real pruning
    assert 0 < len(got) < len(commits)


# --- 3. end-to-end spark.sql exactness ------------------------------------


def test_store_sql_eq_prefix(spark, docs_store):
    got = datasource.store_sql(
        spark,
        "SELECT doc_id, lang, source, n_chars FROM docs "
        "WHERE lang = 'en' AND source LIKE 'src1%'",
        stores={"docs": docs_store},
        columns={"docs": ["doc_id", "lang", "source", "n_chars"]},
    )
    want = (spark.read.parquet(DOCS)
            .filter((F.col("lang") == "en") & F.col("source").startswith("src1"))
            .select("doc_id", "lang", "source", "n_chars"))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_store_sql_int_and_float_ranges(spark, events_store):
    got = datasource.store_sql(
        spark,
        "SELECT event_id, value FROM ev "
        "WHERE value >= 10.0 AND value <= 25.0 AND event_id > 100",
        stores={"ev": events_store},
        columns={"ev": ["event_id", "value"]},
    )
    want = (spark.read.parquet(EVENTS)
            .filter((F.col("value") >= 10.0) & (F.col("value") <= 25.0)
                    & (F.col("event_id") > 100))
            .select("event_id", "value"))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_store_sql_unconvertible_filters_still_exact(spark, docs_store):
    """OR across columns and IsNull cannot be pushed; Spark must apply them
    post-scan and the result stays exact (nothing consumed that shouldn't
    be)."""
    got = datasource.store_sql(
        spark,
        "SELECT doc_id, lang FROM docs "
        "WHERE lang = 'en' OR source = 'src2'",
        stores={"docs": docs_store},
        columns={"docs": ["doc_id", "lang", "source"]},
    ).select("doc_id", "lang")
    want = (spark.read.parquet(DOCS)
            .filter((F.col("lang") == "en") | (F.col("source") == "src2"))
            .select("doc_id", "lang"))
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_store_sql_aggregate_over_pushdown(spark, docs_store):
    got = datasource.store_sql(
        spark,
        "SELECT lang, count(*) AS cnt FROM docs WHERE lang IN ('en', 'de') "
        "GROUP BY lang ORDER BY lang",
        stores={"docs": docs_store},
        columns={"docs": ["lang"]},
    ).collect()
    want = (spark.read.parquet(DOCS).filter(F.col("lang").isin("en", "de"))
            .groupBy("lang").agg(F.count("*").alias("cnt"))
            .orderBy("lang").collect())
    assert got == want


# --- 4. the plan-caching hazard and the safe default ----------------------


def test_view_default_is_correct_across_queries(spark, docs_store):
    """pushdown=False view: cached plan is the full decode, so ANY sequence
    of queries over the same registration is exact."""
    datasource.store_sql_view(spark, docs_store, "docs_v")
    a = spark.sql("SELECT count(*) AS c FROM docs_v WHERE lang = 'en'").collect()[0].c
    b = spark.sql("SELECT count(*) AS c FROM docs_v").collect()[0].c
    c = spark.sql("SELECT count(*) AS c FROM docs_v WHERE lang = 'de'").collect()[0].c
    src = spark.read.parquet(DOCS)
    assert a == src.filter(F.col("lang") == "en").count()
    assert b == src.count()
    assert c == src.filter(F.col("lang") == "de").count()


def test_projection_via_columns_option(spark, docs_store):
    df = datasource.store_sql(
        spark, "SELECT doc_id FROM d", stores={"d": docs_store},
        columns={"d": ["doc_id"]})
    assert df.columns == ["doc_id"]
    assert df.count() == spark.read.parquet(DOCS).count()
