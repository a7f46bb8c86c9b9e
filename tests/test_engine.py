"""End-to-end engine tests: encode -> decode bit-identical, resume, metrics.

Mirrors the reference's validation strategy (SURVEY §5): its
test_parquet_validation.go re-reads every output file and field-compares
against the embedded raw_log oracle; here the oracle is the source table
itself and the comparison is exact (exceptAll both directions + per-url
text equality), made order-insensitive because the encode shuffle reorders
rows.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from flowforge import datagen, engine
from flowforge.catalog import Manifest

ROWS = 4_000


def _committed(out: str) -> set[int]:
    man = Manifest(out)
    return man.committed_buckets(man.read_table_meta()["plan_hash"])


@pytest.fixture(scope="module")
def src_df(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("src")
    path = datagen.write_webpages(str(d), ROWS)
    return spark.read.parquet(path)


def test_roundtrip_bit_identical(spark, src_df, tmpdir_clean):
    out = os.path.join(tmpdir_clean, "enc")
    metrics = engine.run_encode(spark, src_df, out, buckets=8)
    assert len(metrics) == 8 * 5  # (bucket, column) rows
    decoded = engine.decode_table(spark, out)
    assert decoded.count() == ROWS
    assert decoded.exceptAll(src_df).count() == 0
    assert src_df.exceptAll(decoded).count() == 0


def test_per_url_text_byte_identical(spark, src_df, tmpdir_clean):
    """input_hint invariant: byte-identical extracted text per url."""
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode(spark, src_df, out, buckets=8)
    decoded = engine.decode_table(spark, out, columns=["url", "text"])
    joined = src_df.select("url", F.col("text").alias("src_text")).join(
        decoded.withColumnRenamed("text", "dec_text"), "url", "inner"
    )
    assert joined.count() == ROWS  # url is unique -> join is 1:1
    mismatches = joined.filter(
        F.md5(F.col("src_text")) != F.md5(F.col("dec_text"))
    ).count()
    assert mismatches == 0


def test_resume_skips_committed_buckets(spark, src_df, tmpdir_clean):
    """Interrupted run: pre-commit half the buckets, re-run, verify the
    committed half is untouched (same file mtimes+bytes) and the final
    decode matches the source exactly."""
    out = os.path.join(tmpdir_clean, "enc")
    # first run, full
    engine.run_encode(spark, src_df, out, buckets=8)
    man = Manifest(out)
    assert _committed(out) == set(range(8))

    # simulate interruption: drop commits + chunk files for buckets 4..7
    for b in range(4, 8):
        man.uncommit_bucket(b)
        for f in glob.glob(os.path.join(out, "chunks", "column=*", f"bucket-{b:06d}.parquet")):
            os.remove(f)
    kept_files = sorted(glob.glob(os.path.join(out, "chunks", "column=*", "*.parquet")))
    kept_stat = {f: (os.path.getmtime(f), os.path.getsize(f)) for f in kept_files}

    # resumed run: must only encode buckets 4..7
    metrics = engine.run_encode(spark, src_df, out, buckets=8)
    assert {r["bucket"] for r in metrics} == {4, 5, 6, 7}
    assert _committed(out) == set(range(8))
    for f, st in kept_stat.items():
        assert (os.path.getmtime(f), os.path.getsize(f)) == st, f"re-encoded {f}"

    decoded = engine.decode_table(spark, out)
    assert decoded.exceptAll(src_df).count() == 0
    assert src_df.exceptAll(decoded).count() == 0


def test_noop_when_fully_committed(spark, src_df, tmpdir_clean):
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode(spark, src_df, out, buckets=4)
    metrics = engine.run_encode(spark, src_df, out, buckets=4)
    assert metrics == []


def test_metrics_and_lineage(spark, src_df, tmpdir_clean):
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode(spark, src_df, out, buckets=4)
    m = engine.metrics_table(spark, out)
    assert m.count() == 4 * 5
    rep = engine.compression_report(spark, out).collect()
    by_col = {r["column"]: r for r in rep}
    assert set(by_col) == {"url", "warc_ts", "html", "text", "lang"}
    # selector expectations on this data shape (FIXTURES.md §1)
    assert "dict" in by_col["lang"]["codecs"]
    assert by_col["lang"]["ratio"] < 0.1
    assert by_col["warc_ts"]["ratio"] < 0.8
    for r in rep:
        assert r["bytes_out"] > 0 and r["bytes_in"] > 0
    # lineage records carry per-column wall_ms for throughput accounting
    man = Manifest(out)
    rec = man.read_commits(man.read_table_meta()["plan_hash"])[0]
    assert rec["columns"]["text"]["wall_ms"] >= 0


def test_decode_reordered_columns(spark, src_df, tmpdir_clean):
    """A projection in non-schema order must keep name->value binding:
    mapInArrow binds positionally, so the output schema must follow the
    caller's order (regression: reordered string columns silently swapped)."""
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode(spark, src_df, out, buckets=4)
    d = engine.decode_table(spark, out, columns=["text", "url", "lang"])
    assert d.columns == ["text", "url", "lang"]
    row = d.filter(F.col("url").startswith("https://")).limit(1).collect()[0]
    assert row["url"].startswith("https://")
    assert not row["text"].startswith("https://")
    joined = src_df.select("url", F.col("lang").alias("src_lang")).join(
        d.select("url", "lang"), "url")
    assert joined.filter(F.col("lang") != F.col("src_lang")).count() == 0


def test_decode_column_pruning(spark, src_df, tmpdir_clean):
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode(spark, src_df, out, buckets=4)
    lang_only = engine.decode_table(spark, out, columns=["lang"])
    assert lang_only.columns == ["lang"]
    counts = {r["lang"]: r["cnt"] for r in lang_only.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    src_counts = {r["lang"]: r["cnt"] for r in src_df.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert counts == src_counts


def test_salting_defuses_host_skew(spark, src_df, tmpdir_clean):
    """Zipf(1.2) hosts -> heavy host skew, but xxhash64(url) salting must
    spread rows near-uniformly across buckets."""
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode(spark, src_df, out, buckets=8)
    man = Manifest(out)
    rows = [rec["n_rows"]
            for rec in man.read_commits(man.read_table_meta()["plan_hash"])]
    assert len(rows) == 8
    mean = sum(rows) / len(rows)
    assert max(rows) < 1.35 * mean, rows


def test_direct_mode_roundtrip_and_resume(spark, tmpdir_clean, tmp_path_factory):
    """No-shuffle scan-task encode: plan from row-group metadata, encode,
    decode bit-identical; resume re-encodes only missing buckets."""
    import glob as globmod

    d = tmp_path_factory.mktemp("direct_src")
    src = datagen.write_webpages(str(d), ROWS, row_group_size=512)
    out = os.path.join(tmpdir_clean, "enc_direct")
    df = spark.read.parquet(src)

    metrics = engine.run_encode_path(spark, src, out, target_rows=512)
    buckets = {r["bucket"] for r in metrics}
    assert len(buckets) == ROWS // 512 + (1 if ROWS % 512 else 0)

    decoded = engine.decode_table(spark, out)
    assert decoded.exceptAll(df).count() == 0
    assert df.exceptAll(decoded).count() == 0

    # interrupt: remove two commits + their chunk files
    man = Manifest(out)
    victims = sorted(buckets)[:2]
    for b in victims:
        man.uncommit_bucket(b)
        for f in globmod.glob(os.path.join(out, "chunks", "column=*", f"bucket-{b:06d}.parquet")):
            os.remove(f)
    m2 = engine.run_encode_path(spark, src, out, target_rows=512)
    assert {r["bucket"] for r in m2} == set(victims)
    decoded2 = engine.decode_table(spark, out)
    assert decoded2.exceptAll(df).count() == 0

    # fully committed -> noop
    assert engine.run_encode_path(spark, src, out, target_rows=512) == []


def test_zone_map_predicate_pushdown(spark, tmpdir_clean, tmp_path_factory):
    """Range predicates prune buckets (driver, commit zone maps) and chunks
    (task, chunk zone maps) on a clustered column, and the row filter makes
    the result exact."""
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("zm_src")
    src = datagen.write_webpages(str(d), ROWS, row_group_size=512)
    out = os.path.join(tmpdir_clean, "enc")
    # direct mode keeps natural (near-sorted warc_ts) order -> tight zones
    engine.run_encode_path(spark, src, out, target_rows=512)
    df = spark.read.parquet(src)

    lo_ts, hi_ts = [r[0] for r in df.select(
        F.expr("percentile(unix_micros(cast(warc_ts as timestamp)), 0.3)").cast("long"),
    ).collect()][0], None
    hi_row = df.select(
        F.expr("percentile(unix_micros(cast(warc_ts as timestamp)), 0.5)").cast("long")
    ).collect()[0][0]
    lo, hi = int(lo_ts), int(hi_row)

    man = Manifest(out)
    phash = man.read_table_meta()["plan_hash"]
    commits = man.read_commits(phash)
    pruned = engine._prune_buckets(commits, {"warc_ts": ("range", lo, hi)})
    assert 0 < len(pruned) < len(commits)  # real pruning happened

    got = engine.decode_table(spark, out, predicates={"warc_ts": (lo, hi)})
    want = df.filter(
        (F.unix_micros(F.col("warc_ts").cast("timestamp")) >= lo)
        & (F.unix_micros(F.col("warc_ts").cast("timestamp")) <= hi)
    )
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # predicates on unordered domains refuse
    import pytest as _pytest

    with _pytest.raises(ValueError, match="int-ordered"):
        engine.decode_table(spark, out, predicates={"text": (0, 1)})


def test_zone_map_multi_predicate(spark, tmpdir_clean):
    """Two range predicates intersect at bucket, chunk, and row level."""
    from pyspark.sql import functions as F

    src = "/root/testdata/sf0.001/events.parquet"
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode_path(spark, src, out, target_rows=256)
    df = spark.read.parquet(src)
    ids = (100, 600)
    ts_lo = 1_704_067_200_000_000 + 2 * 86_400_000_000
    ts_hi = ts_lo + 12 * 86_400_000_000
    got = engine.decode_table(
        spark, out, columns=["event_id", "user_id"],
        predicates={"event_id": ids, "ts": (ts_lo, ts_hi)},
    )
    want = df.filter(
        F.col("event_id").between(*ids)
        & F.unix_micros(F.col("ts").cast("timestamp")).between(ts_lo, ts_hi)
    ).select("event_id", "user_id")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_codec_error_fallback_and_accounting(spark, tmpdir_clean, monkeypatch):
    """M2 analog (main.go:205-228): a failing codec selection falls back to
    plain (no data loss), the error is counted into the commit record and
    metrics_table, and logging is throttled."""
    import pyarrow as pa

    from flowforge import engine, selector
    from flowforge.codecs import chunk as chunklib

    real = selector.encode_best

    def flaky(arr, hint=None):
        if chunklib.is_bytes_type(arr.type):
            raise RuntimeError("injected codec failure")
        return real(arr, hint)

    monkeypatch.setattr(selector, "encode_best", flaky)
    monkeypatch.setattr(engine, "_error_logs_left", 2)
    tbl = pa.table({
        "k": pa.array(range(100), pa.int64()),
        "s": pa.array([f"v{i}" for i in range(100)], pa.large_string()),
    })
    out = os.path.join(tmpdir_clean, "store")
    from flowforge.catalog import plan_hash

    ph = plan_hash({"mode": "salted", "buckets": 1})
    Manifest(out).write_table_meta({
        "format": engine.FORMAT_VERSION, "columns": ["k", "s"],
        "spark_schema": {"type": "struct", "fields": [
            {"name": "k", "type": "long", "nullable": False, "metadata": {}},
            {"name": "s", "type": "string", "nullable": False, "metadata": {}},
        ]},
        "plan": {"format": engine.FORMAT_VERSION, "mode": "salted",
                 "buckets": 1, "chunk_rows": 40, "salt_col": "k"},
        "plan_hash": ph,
    })
    metrics = engine._encode_bucket(out, 0, tbl, chunk_rows=40, phash=ph)
    by_col = {m["column"]: m for m in metrics}
    assert by_col["s"]["errors"] == 3      # 3 chunks of <=40 rows, all failed
    assert by_col["s"]["codecs"] == "plain"
    assert by_col["k"]["errors"] == 0
    man = Manifest(out)
    rec = man.read_commits(ph)[0]
    assert rec["columns"]["s"]["errors"] == 3
    m = engine.metrics_table(spark, out)
    assert m.filter(m.column == "s").collect()[0]["errors"] == 3
    # and the data still round-trips via the plain fallback
    decoded = engine.decode_table(spark, out).collect()
    assert sorted(r["s"] for r in decoded) == sorted(f"v{i}" for i in range(100))


def test_direct_plan_deterministic(tmp_path_factory):
    d = tmp_path_factory.mktemp("plan_src")
    src = datagen.write_webpages(str(d), 2000, row_group_size=256)
    p1 = engine.plan_direct(src, 512)
    p2 = engine.plan_direct(src, 512)
    assert p1 == p2
    assert sum(p["n_rows"] for p in p1) == 2000


def test_string_predicate_pushdown_prunes_chunks(spark, tmpdir_clean, tmp_path_factory):
    """Equality/IN pushdown on a string column (round-2 verdict, missing
    #3): on a lang-clustered store, bytes zone maps + the dict-store
    short-circuit prune most chunks before decoding — pinned via the
    chunk-skip count computed from the stored metas — and the decoded
    result equals the source filter exactly."""
    import json

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("strpred_src")
    src = datagen.write_webpages(str(d), ROWS, row_group_size=512)
    out = os.path.join(tmpdir_clean, "enc")
    # cluster chunks by lang inside each bucket -> tight bytes zone maps
    engine.run_encode_path(spark, src, out, target_rows=512,
                           sort_col="lang", chunk_rows=64)
    df = spark.read.parquet(src)

    spec = ("in", [b"de"], ["de"])
    man = Manifest(out)
    phash = man.read_table_meta()["plan_hash"]
    total = survivors = 0
    for rec in man.read_commits(phash):
        bucket = int(rec["bucket"])
        t = pq.read_table(man.chunk_read_path("lang", bucket),
                          columns=["chunk_seq", "meta"])
        for m in t.column("meta").to_pylist():
            total += 1
            survivors += engine._chunk_survives(json.loads(m), spec)
    # 'de' is 10% of rows; clustered chunks -> most chunks prune away
    assert survivors < total * 0.3, (survivors, total)
    assert survivors > 0

    got = engine.decode_table(spark, out, columns=["url", "lang"],
                              predicates={"lang": ("eq", "de")})
    want = df.filter(F.col("lang") == "de").select("url", "lang")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # IN over two langs, projecting a non-predicate column
    got2 = engine.decode_table(spark, out, columns=["url"],
                               predicates={"lang": ("in", ["de", "ru"])})
    want2 = df.filter(F.col("lang").isin("de", "ru")).select("url")
    assert got2.count() == want2.count() > 0
    assert got2.exceptAll(want2).count() == 0


def test_dict_short_circuit_and_zone_probe():
    """Unit pins for the bytes-pruning primitives: truncated-prefix zone
    tests stay sound at the cap boundary, and dict_may_contain answers
    membership from the dictionary store alone."""
    import pyarrow as pa

    from flowforge.codecs import chunk as chunklib

    # zone probe at the truncation boundary: 24-byte cap
    zmin, zmax = b"b" * 30, b"m" * 30
    bmin_t, bmax_t = zmin[:24], zmax[:24]
    assert chunklib.probe_in_zone(b"hello", bmin_t, bmax_t)
    assert not chunklib.probe_in_zone(b"a" * 40, bmin_t, bmax_t)   # below min
    assert not chunklib.probe_in_zone(b"z", bmin_t, bmax_t)        # above max
    # probes equal to the truncated prefixes are conservatively kept
    assert chunklib.probe_in_zone(bmax_t, bmin_t, bmax_t)
    assert chunklib.probe_in_zone(bmin_t, bmin_t, bmax_t)

    arr = pa.array(["en", "de", "en", None, "fr"], type=pa.large_string())
    for codec in ("dict", "dictfsst"):
        payload, meta = chunklib.encode_array(arr, codec)
        assert chunklib.dict_may_contain(payload, meta, [b"de"]) is True
        assert chunklib.dict_may_contain(payload, meta, [b"zz"]) is False
        assert chunklib.dict_may_contain(payload, meta, [b"zz", b"fr"]) is True
    payload, meta = chunklib.encode_array(arr, "plain")
    assert chunklib.dict_may_contain(payload, meta, [b"de"]) is None


def test_clustered_mode_roundtrip_prune_resume(spark, tmpdir_clean):
    """Clustered mode (round-2 verdict, missing #2): quantile range buckets
    on ts give >90% driver-side bucket pruning for a narrow window on a
    SHUFFLED store, the roundtrip stays bit-identical, boundaries are
    frozen into the plan (resume adopts them), and a conflicting
    cluster_col refuses."""
    from flowforge.catalog import StorePlanError

    src = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode(spark, src, out, buckets=32, cluster_col="ts")
    man = Manifest(out)
    meta = man.read_table_meta()
    assert meta["plan"]["mode"] == "clustered"
    assert len(meta["plan"]["boundaries"]) == 31

    dec = engine.decode_table(spark, out)
    assert dec.count() == src.count()
    assert dec.exceptAll(src).count() == 0 and src.exceptAll(dec).count() == 0

    lo = 1_704_067_200_000_000 + 10 * 86_400_000_000
    hi = lo + 2 * 86_400_000_000
    commits = man.read_commits(meta["plan_hash"])
    surviving = engine._prune_buckets(commits, {"ts": ("range", lo, hi)})
    assert len(surviving) <= len(commits) * 0.10, (len(surviving), len(commits))
    got = engine.decode_table(spark, out, columns=["event_id", "ts"],
                              predicates={"ts": (lo, hi)})
    want = src.filter(
        F.unix_micros(F.col("ts").cast("timestamp")).between(lo, hi)
    ).select("event_id", "ts")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0

    # resume adopts the stored boundaries (no recompute, exact bucket ids)
    man.uncommit_bucket(7)
    m2 = engine.run_encode(spark, src, out)
    assert {r["bucket"] for r in m2} == {7}
    with pytest.raises(StorePlanError):
        engine.run_encode(spark, src, out, cluster_col="event_id")


def test_clustered_mode_empty_buckets_commit(spark, tmpdir_clean):
    """Quantile-duplicate boundaries leave some buckets legitimately empty:
    a completed run commits them as zero-row records so the completeness
    check passes and decode skips them."""
    from pyspark.sql import Row

    # 100 rows, constant-heavy key -> duplicate boundaries -> empty buckets
    rows = [Row(k=5 if i < 90 else i, v=f"x{i}") for i in range(100)]
    src = spark.createDataFrame(rows)
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode(spark, src, out, buckets=8, cluster_col="k",
                      chunk_rows=16)
    man = Manifest(out)
    phash = man.read_table_meta()["plan_hash"]
    assert man.committed_buckets(phash) == set(range(8))  # empties committed
    empties = [r for r in man.read_commits(phash) if r["n_rows"] == 0]
    assert empties, "expected zero-row commits for empty quantile intervals"
    dec = engine.decode_table(spark, out)
    assert dec.count() == 100
    assert dec.exceptAll(src).count() == 0 and src.exceptAll(dec).count() == 0


def test_prefix_predicate_pushdown(spark, tmpdir_clean, tmp_path_factory):
    """('prefix', p) predicates: byte-range zone pruning on a url-sorted
    store + dict-store prefix short-circuit + exact starts_with row
    filter; result equals the source LIKE 'p%' filter."""
    from flowforge.codecs import chunk as chunklib
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("prefix_src")
    src = datagen.write_webpages(str(d), ROWS, row_group_size=512)
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode_path(spark, src, out, target_rows=512,
                           sort_col="url", chunk_rows=64)
    df = spark.read.parquet(src)

    p = "https://host12."
    got = engine.decode_table(spark, out, columns=["url", "lang"],
                              predicates={"url": ("prefix", p)})
    want = df.filter(F.col("url").startswith(p)).select("url", "lang")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # multiple prefixes OR together
    got2 = engine.decode_table(
        spark, out, columns=["url"],
        predicates={"url": ("prefix", ["https://host3.", "https://host7."])})
    want2 = df.filter(F.col("url").startswith("https://host3.")
                      | F.col("url").startswith("https://host7.")).select("url")
    assert got2.count() == want2.count() > 0
    assert got2.exceptAll(want2).count() == 0

    # zone primitive edge cases: 0xFF-run prefixes have no upper bound
    assert chunklib._prefix_upper(b"ab") == b"ac"
    assert chunklib._prefix_upper(b"a\xff\xff") == b"b"
    assert chunklib._prefix_upper(b"\xff\xff") is None
    assert chunklib.prefix_in_zone(b"\xff\xff", b"a" * 24, b"\xff" * 24)
    assert not chunklib.prefix_in_zone(b"z", b"a" * 24, b"m" * 24)
    assert not chunklib.prefix_in_zone(b"A", b"a" * 24, b"m" * 24)


def test_contains_suffix_predicate_pushdown(spark, tmpdir_clean,
                                            tmp_path_factory):
    """('contains', s) / ('suffix', s) predicates (round 5): no zone-map
    pruning exists for substring matches, but the exact byte-level mask
    (UTF-8 is self-synchronizing, so byte containment == string
    containment) decodes only the predicate column; dict-coded chunks
    short-circuit off the value store. Result equals Spark's own
    contains/endswith filters."""
    d = tmp_path_factory.mktemp("contains_src")
    src = datagen.write_webpages(str(d), ROWS, row_group_size=512)
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode_path(spark, src, out, target_rows=512, chunk_rows=64)
    df = spark.read.parquet(src)

    got = engine.decode_table(spark, out, columns=["url", "lang"],
                              predicates={"url": ("contains", "host12")})
    want = df.filter(F.col("url").contains("host12")).select("url", "lang")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # multiple probes OR together; suffix matches the url tail
    got2 = engine.decode_table(
        spark, out, columns=["url"],
        predicates={"url": ("suffix", ["?id=7", "?id=42"])})
    want2 = df.filter(F.col("url").endswith("?id=7")
                      | F.col("url").endswith("?id=42")).select("url")
    assert got2.count() == want2.count() > 0
    assert got2.exceptAll(want2).count() == 0

    # dict short-circuit primitives
    from flowforge.codecs import chunk as chunklib
    import pyarrow as pa
    arr = pa.array([b"alpha", b"beta", b"alpha"], type=pa.large_binary())
    payload, meta = chunklib.encode_array(arr, "dict")
    assert chunklib.dict_may_contain(payload, meta, [b"lph"],
                                     mode="contains") is True
    assert chunklib.dict_may_contain(payload, meta, [b"zz"],
                                     mode="contains") is False
    assert chunklib.dict_may_contain(payload, meta, [b"eta"],
                                     mode="suffix") is True
    assert chunklib.dict_may_contain(payload, meta, [b"alp"],
                                     mode="suffix") is False

    # empty probes and non-string columns are refused up front
    with pytest.raises(ValueError, match="empty 'contains' probe"):
        engine.decode_table(spark, out,
                            predicates={"url": ("contains", "")})
    with pytest.raises(ValueError, match="string/binary"):
        engine.decode_table(spark, out,
                            predicates={"warc_ts": ("suffix", "x")})


def test_int_in_predicate_pushdown(spark, tmpdir_clean):
    """('in', [ints]) / ('eq', int) on int-ordered columns: zone membership
    pruning + exact is_in row filter; timestamps take epoch-unit values."""
    src_path = "/root/testdata/sf0.001/events.parquet"
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode_path(spark, src_path, out, target_rows=256)
    df = spark.read.parquet(src_path)
    ids = [5, 77, 300, 888, 999_999]
    got = engine.decode_table(spark, out, columns=["event_id", "user_id"],
                              predicates={"event_id": ("in", ids)})
    want = df.filter(F.col("event_id").isin(ids)).select("event_id", "user_id")
    assert got.count() == want.count() == 4
    assert got.exceptAll(want).count() == 0
    assert engine.decode_table(spark, out, columns=["event_id"],
                               predicates={"event_id": ("eq", 42)}).count() == 1
    with pytest.raises(ValueError, match="integer values"):
        engine.decode_table(spark, out, predicates={"ts": ("eq", "x")})


def test_store_view_sql_surface(spark, src_df, tmpdir_clean):
    """spark.sql over a registered chunk-store view."""
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode(spark, src_df, out, buckets=4)
    engine.store_view(spark, out, "pages", columns=["url", "lang", "text"])
    got = {r["lang"]: r["cnt"] for r in spark.sql(
        "SELECT lang, count(*) AS cnt FROM pages GROUP BY lang").collect()}
    want = {r["lang"]: r["cnt"] for r in src_df.groupBy("lang")
            .agg(F.count("*").alias("cnt")).collect()}
    assert got == want
    spark.catalog.dropTempView("pages")


def test_bucket_search_expr_matches_linear_fold(spark):
    """The binary-search CASE tree (ADVICE r3) must agree with the linear
    fold it replaced: bucket = #{i : boundaries[i] <= v}, nulls -> 0.
    Covers duplicates, below-all, above-all, and exact boundary hits."""
    from pyspark.sql import Row

    boundaries = [-5, 0, 0, 7, 7, 7, 100]
    vals = [None, -(2 ** 62), -6, -5, -4, -1, 0, 1, 6, 7, 8, 99, 100,
            101, 2 ** 62]
    df = spark.createDataFrame([Row(i=i, v=v) for i, v in enumerate(vals)],
                               schema="i long, v long")
    expr = engine._bucket_search_expr(F.col("v"), boundaries)
    got = {r["i"]: r["b"] for r in
           df.select("i", expr.alias("b")).collect()}
    want = {i: (0 if v is None else sum(1 for b in boundaries if b <= v))
            for i, v in enumerate(vals)}
    assert got == want


def test_bucket_search_expr_udf_fallback_parity(spark, monkeypatch):
    """Past _BUCKET_EXPR_MAX_BOUNDARIES the assignment switches to a
    vectorized searchsorted pandas UDF; same answers, including nulls and
    int64 extremes (the nullable-long float64 trap is dodged via the
    sentinel coalesce)."""
    from pyspark.sql import Row

    boundaries = list(range(0, 1000, 7))
    big = 2 ** 62 + 12345  # not float64-representable exactly
    vals = [None, -1, 0, 1, 6, 7, 500, 993, 994, big, -(2 ** 63) + 1]
    df = spark.createDataFrame([Row(i=i, v=v) for i, v in enumerate(vals)],
                               schema="i long, v long")
    want = {i: (0 if v is None else sum(1 for b in boundaries if b <= v))
            for i, v in enumerate(vals)}

    monkeypatch.setattr(engine, "_BUCKET_EXPR_MAX_BOUNDARIES", 8)
    expr = engine._bucket_search_expr(F.col("v"), boundaries)
    got = {r["i"]: r["b"] for r in
           df.select("i", expr.alias("b")).collect()}
    assert got == want


def test_finalize_store_completes_lazy_encode(spark, tmpdir_clean):
    """ADVICE r3: the lazy API (encode_table().collect()) on a store with
    empty planned buckets used to leave it incomplete forever. decode now
    points at finalize_store, and finalize_store commits the empties."""
    from pyspark.sql import Row

    # constant-heavy key -> duplicate quantile boundaries -> empty buckets
    rows = [Row(k=5 if i < 90 else i, v=f"x{i}") for i in range(100)]
    src = spark.createDataFrame(rows)
    out = os.path.join(tmpdir_clean, "enc")
    engine.encode_table(spark, src, out, buckets=8, cluster_col="k",
                        chunk_rows=16).collect()
    with pytest.raises(ValueError, match="finalize_store"):
        engine.decode_table(spark, out)
    engine.finalize_store(out)
    engine.finalize_store(out)  # idempotent
    dec = engine.decode_table(spark, out)
    assert dec.count() == 100
    assert dec.exceptAll(src).count() == 0 and src.exceptAll(dec).count() == 0


def test_decode_cli_rejects_conflicting_filters(tmp_path):
    """ADVICE r3: --eq/--in/--prefix on the same column silently overwrote
    each other (and any --predicate range); now it's an argparse error."""
    import sys
    from unittest import mock

    from jobs import decode as decode_cli

    base = ["decode.py", "--store", str(tmp_path), "--out", str(tmp_path)]
    bad = [
        ["--eq", "lang:en", "--in", "lang:en,de"],
        ["--predicate", "ts:0:10", "--eq", "ts:5"],
        ["--prefix", "url:https://a", "--prefix", "url:https://b"],
        ["--eq", "lang:en", "--eq", "lang:de"],
    ]
    for extra in bad:
        with mock.patch.object(sys, "argv", base + extra), \
                pytest.raises(SystemExit) as exc:
            decode_cli.main()
        assert exc.value.code == 2, extra
    # repeated --predicate on one column is the documented intersect path
    ok = base + ["--predicate", "ts:0:10", "--predicate", "ts:5:20"]
    with mock.patch.object(sys, "argv", ok), pytest.raises(Exception) as exc:
        decode_cli.main()
    assert not isinstance(exc.value, SystemExit)  # got past argparse


def test_metrics_table_distributed_no_driver_parse(spark, src_df,
                                                   tmpdir_clean, monkeypatch):
    """Round-3 verdict wrong #1: metrics_table must read the commit logs
    distributively. Parity vs a read_commits-derived oracle on a store
    holding BOTH a compacted log and a fresh delta that supersedes one of
    its records (max_by dedup = _newer), and the driver JSON path must not
    run at all."""
    out = os.path.join(tmpdir_clean, "enc")
    engine.run_encode(spark, src_df, out, buckets=4)  # compacts at the end
    man = Manifest(out)
    phash = man.read_table_meta()["plan_hash"]
    # re-encode one bucket WITHOUT compacting: a delta now shadows the
    # compacted record for that bucket (newer committed_at wins)
    man.uncommit_bucket(2)
    engine.encode_table(spark, src_df, out).collect()
    names = man.store.list(man.dir)
    assert any(n.startswith("compacted-") for n in names)
    assert any(n.startswith("commit-2-") for n in names), names

    oracle = []
    for rec in man.read_commits(phash):
        for c, st in rec["columns"].items():
            oracle.append((rec["bucket"], c, rec["n_rows"], rec["n_chunks"],
                           st["bytes_in"], st["bytes_out"], st["wall_ms"],
                           st["codecs"], st.get("errors", 0)))

    monkeypatch.setattr(
        Manifest, "read_commits",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("metrics_table materialized commits driver-side")))
    m = engine.metrics_table(spark, out)
    assert [f.name for f in m.schema.fields] == [
        "bucket", "column", "n_rows", "n_chunks", "bytes_in", "bytes_out",
        "wall_ms", "codecs", "errors"]
    got = sorted(tuple(r) for r in m.collect())
    assert got == sorted(oracle)
