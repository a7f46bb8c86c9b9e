"""Float range predicates (round-3 verdict, missing #2).

Float zone maps store ORDER-PRESERVING int64 keys (format v5): the raw bit
view of a float column does not order (negative floats have descending bit
patterns), so chunk/bucket min/max go through the standard monotone
transform instead. These tests prove:

1. key monotonicity: ``float_order_keys`` is strictly monotone w.r.t. the
   IEEE-754 totalOrder Spark uses (-NaN < -inf < neg < -0=+0 < pos < +inf
   < NaN), for float64 and float32, on adversarial values (hypothesis);
2. bound soundness: ``float_key`` of a predicate bound brackets every
   value the bound admits/excludes — including the float64->float32
   widening step;
3. end-to-end exactness: ``decode_table(predicates={"value": (lo, hi)})``
   equals the Spark source filter on data containing NaN/±0/±inf, with
   real bucket+chunk pruning pinned;
4. Spark NaN semantics: NaN sorts above +inf — it satisfies any lower
   bound and fails any finite upper bound.
"""

from __future__ import annotations

import json
import math
import os
import struct
import sys

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from flowforge import engine  # noqa: E402
from flowforge.catalog import Manifest  # noqa: E402
from flowforge.codecs import chunk as chunklib  # noqa: E402


def _rank64(bits: int) -> tuple:
    """Spark comparison rank from the stored int64 bit view: every NaN
    pattern (either sign bit) is ONE value above +inf; -0 == +0."""
    x = struct.unpack("<d", struct.pack("<q", bits))[0]
    if math.isnan(x):
        return (3, 0)
    if x == 0:
        return (1, 0.0)
    return (0, x) if x < 0 else (2, x)


def _rank32(bits32: int) -> tuple:
    x = struct.unpack("<f", struct.pack("<i", bits32))[0]
    if math.isnan(x):
        return (3, 0)
    if x == 0:
        return (1, 0.0)
    return (0, x) if x < 0 else (2, x)


_f64 = st.one_of(
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.sampled_from([0.0, -0.0, math.inf, -math.inf, math.nan,
                     5e-324, -5e-324, 1.7976931348623157e308]),
)


@settings(max_examples=300, deadline=None)
@given(xs=st.lists(_f64, min_size=2, max_size=20))
def test_float64_keys_are_monotone(xs):
    bits = np.array(xs, dtype=np.float64).view(np.int64)
    keys = chunklib.float_order_keys(bits, "double")
    for i in range(len(xs)):
        for j in range(len(xs)):
            ri, rj = _rank64(int(bits[i])), _rank64(int(bits[j]))
            if ri < rj:
                assert keys[i] < keys[j], (xs[i], xs[j], keys[i], keys[j])
            elif ri == rj:
                assert keys[i] == keys[j]


@settings(max_examples=300, deadline=None)
@given(xs=st.lists(st.floats(allow_nan=True, allow_infinity=True, width=32),
                   min_size=2, max_size=20))
def test_float32_keys_are_monotone(xs):
    bits32 = np.array(xs, dtype=np.float32).view(np.int32)
    # stored int64 view of a float32 column is the sign-extended int32 bits
    keys = chunklib.float_order_keys(bits32.astype(np.int64), "float")
    for i in range(len(xs)):
        for j in range(len(xs)):
            ri, rj = _rank32(int(bits32[i])), _rank32(int(bits32[j]))
            if ri < rj:
                assert keys[i] < keys[j]
            elif ri == rj:
                assert keys[i] == keys[j]


@settings(max_examples=300, deadline=None)
@given(x=st.floats(allow_nan=False, allow_infinity=True, width=64),
       b=st.floats(allow_nan=False, allow_infinity=True, width=64))
def test_float_key_bound_soundness_double(x, b):
    """If x satisfies the bound in float64 arithmetic, its stored key falls
    inside [key(lo), key(hi)] — zone maps never prune a matching value."""
    kx = chunklib.float_order_keys(
        np.array([x], dtype=np.float64).view(np.int64), "double")[0]
    kb = chunklib.float_key(b, "double")
    if x >= b:
        assert kx >= kb
    if x <= b:
        assert kx <= kb


@settings(max_examples=300, deadline=None)
@given(x=st.floats(allow_nan=False, allow_infinity=True, width=32),
       b=st.floats(allow_nan=False, allow_infinity=True, width=64))
def test_float_key_bound_soundness_float32(x, b):
    """float32 widening: decode compares rows in float64 (Spark promotes),
    so a float32 value x satisfies the float64 bound b iff float64(x) >= b.
    The ±1-key widening in _normalize_predicates must cover the
    float64->float32 rounding of the bound."""
    kx = chunklib.float_order_keys(
        np.array([np.float32(x)], dtype=np.float32).view(np.int32)
        .astype(np.int64), "float")[0]
    kb = chunklib.float_key(b, "float")
    if float(np.float32(x)) >= b:
        assert kx >= kb - 1, (x, b, kx, kb)
    if float(np.float32(x)) <= b:
        assert kx <= kb + 1, (x, b, kx, kb)


def _special_df(spark):
    """events-shaped frame with adversarial float values interleaved."""
    from pyspark.sql import functions as F

    rows = []
    specials = [float("nan"), float("inf"), float("-inf"), 0.0, -0.0,
                5e-324, -5e-324, 1e308, -1e308]
    for i in range(2000):
        v = specials[i % len(specials)] if i % 7 == 0 else (i - 1000) / 3.0
        rows.append((i, v))
    return spark.createDataFrame(rows, "event_id long, value double").select(
        "event_id", F.col("value"))


def test_float_range_decode_exact_with_specials(spark, tmpdir_clean):
    """decode_table float predicate == Spark filter, on NaN/±0/±inf data;
    NaN semantics: matches any lower bound, fails any finite upper."""
    from pyspark.sql import functions as F

    src = os.path.join(tmpdir_clean, "src.parquet")
    _special_df(spark).write.parquet(src)
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode_path(spark, src, out, target_rows=256, chunk_rows=64)
    df = spark.read.parquet(src)

    for lo, hi in [(-100.0, 50.0), (0.0, None), (None, 0.0),
                   (-0.0, -0.0), (1e307, None), (None, float("-inf"))]:
        got = engine.decode_table(spark, out, predicates={"value": (lo, hi)})
        want = df
        if lo is not None:
            # Spark's >= has NaN > +inf built in
            want = want.filter(F.col("value") >= lo)
        if hi is not None:
            want = want.filter(F.col("value") <= hi)
        assert got.count() == want.count(), (lo, hi)
        assert got.exceptAll(want).count() == 0, (lo, hi)
        assert want.exceptAll(got).count() == 0, (lo, hi)

    # NaN rows: pass lower-only predicates, fail finite-upper ones
    got_lower = engine.decode_table(spark, out,
                                    predicates={"value": (1e308, None)})
    assert got_lower.filter(F.isnan("value")).count() == \
        df.filter(F.isnan("value")).count() > 0
    got_upper = engine.decode_table(spark, out,
                                    predicates={"value": (None, float("inf"))})
    assert got_upper.filter(F.isnan("value")).count() == 0

    # NaN bounds refuse loudly
    with pytest.raises(ValueError, match="NaN bound"):
        engine.decode_table(spark, out,
                            predicates={"value": (float("nan"), None)})
    with pytest.raises(ValueError, match="needs a bound"):
        engine.decode_table(spark, out, predicates={"value": (None, None)})


def test_float_range_prunes_buckets_and_chunks(spark, tmpdir_clean):
    """Real pruning on a value-clustered events store: narrow float ranges
    drop buckets driver-side (commit zone maps) and chunks task-side."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # value-sorted rewrite with small row groups: direct-mode buckets are
    # contiguous row-group runs, so sorting gives disjoint value ranges per
    # bucket — the layout where float zone maps should prune hard
    t = pq.read_table("/root/testdata/sf0.001/events.parquet")
    t = t.take(pc.sort_indices(t, sort_keys=[("value", "ascending")]))
    src = os.path.join(tmpdir_clean, "src.parquet")
    pq.write_table(t, src, row_group_size=512)
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode_path(spark, src, out, target_rows=512, chunk_rows=64)
    df = spark.read.parquet(src)
    from pyspark.sql import functions as F

    lo, hi = 10.0, 20.0
    man = Manifest(out)
    phash = man.read_table_meta()["plan_hash"]
    commits = man.read_commits(phash)
    norm = engine._normalize_predicates(
        {"value": (lo, hi)}, {"value": "double"})
    spec = norm["value"]
    assert spec[0] == "frange"
    surviving = engine._prune_buckets(commits, norm)
    # value is uniform over a wide range; a 10-unit window prunes most
    assert 0 < len(surviving) < len(commits)

    total = chunk_survivors = 0
    for rec in commits:
        t = pq.read_table(man.chunk_read_path("value", int(rec["bucket"])),
                          columns=["meta"])
        for m in t.column("meta").to_pylist():
            total += 1
            chunk_survivors += engine._chunk_survives(json.loads(m), spec)
    assert chunk_survivors < total * 0.5, (chunk_survivors, total)
    assert chunk_survivors > 0

    got = engine.decode_table(spark, out, columns=["event_id", "value"],
                              predicates={"value": (lo, hi)})
    want = df.filter((F.col("value") >= lo) & (F.col("value") <= hi)) \
             .select("event_id", "value")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_float32_range_decode_exact(spark, tmpdir_clean):
    """float32 column: bounds are widened one key step to cover the
    float64->float32 rounding; rows compare in float64 so the result is
    exactly Spark's filter."""
    from pyspark.sql import functions as F

    src = os.path.join(tmpdir_clean, "src.parquet")
    df = _special_df(spark).select(
        "event_id", F.col("value").cast("float").alias("value"))
    df.write.parquet(src)
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode_path(spark, src, out, target_rows=256, chunk_rows=64)
    src_df = spark.read.parquet(src)

    # bound not representable in float32: 0.1 rounds to 0.100000001...
    for lo, hi in [(0.1, 100.3), (-1e30, 0.1), (None, 16777217.0)]:
        got = engine.decode_table(spark, out, predicates={"value": (lo, hi)})
        want = src_df
        if lo is not None:
            want = want.filter(F.col("value") >= lo)
        if hi is not None:
            want = want.filter(F.col("value") <= hi)
        assert got.count() == want.count(), (lo, hi)
        assert got.exceptAll(want).count() == 0, (lo, hi)
        assert want.exceptAll(got).count() == 0, (lo, hi)


def test_strict_float_bounds_route_with_specials(spark, tmpdir_clean):
    """Strict float bounds (round 5: consumed via nextafter) on NaN/±0/±inf
    data, through BOTH SQL surfaces — the routed aggregate (count must
    include NaN for >, exclude it for <) and the datasource filter
    pushdown — each against Spark's own evaluation of the same statement
    over the raw parquet."""
    from pyspark.sql import functions as F

    from flowforge import datasource, sqlagg

    src = os.path.join(tmpdir_clean, "src.parquet")
    _special_df(spark).write.parquet(src)
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode_path(spark, src, out, target_rows=256, chunk_rows=64)
    spark.read.parquet(src).createOrReplaceTempView("raw_ev")
    for cond in ["value > 0.0", "value < 0.0", "value > -1e-300",
                 "value < 1e308", "value > 1e308",
                 "value > -2.5 AND value < 2.5"]:
        agg_sql = f"SELECT count(*) AS c FROM ev WHERE {cond}"
        assert sqlagg.route_agg_sql(spark, agg_sql, {"ev": out}) \
            is not None, cond
        got = sqlagg.store_agg_sql(spark, agg_sql, {"ev": out}) \
            .collect()[0]["c"]
        want = spark.sql(
            f"SELECT count(*) AS c FROM raw_ev WHERE {cond}"
        ).collect()[0]["c"]
        assert got == want, cond
        rows = datasource.store_sql(
            spark, f"SELECT event_id FROM ev WHERE {cond}", {"ev": out})
        want_rows = spark.sql(
            f"SELECT event_id FROM raw_ev WHERE {cond}")
        assert sorted(r[0] for r in rows.collect()) \
            == sorted(r[0] for r in want_rows.collect()), cond
    # NaN > 0.0 is TRUE in Spark: the routed count for a lower bound
    # must include every NaN row
    n_nan = spark.sql(
        "SELECT count(*) c FROM raw_ev WHERE isnan(value)").collect()[0][0]
    assert n_nan > 0
    got_hi = sqlagg.store_agg_sql(
        spark, "SELECT count(*) AS c FROM ev WHERE value > 1e308",
        {"ev": out}).collect()[0]["c"]
    # only +inf and NaN exceed 1e308's successor... except 1e308 itself is
    # excluded: strict bound correctness at the exact stored value
    want_hi = spark.sql(
        "SELECT count(*) c FROM raw_ev WHERE value > 1e308").collect()[0][0]
    assert got_hi == want_hi
