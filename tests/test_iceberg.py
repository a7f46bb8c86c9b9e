"""Iceberg binding: gating, identifier hygiene, and (skipped-unless-
available) catalog integration. The sandbox ships no iceberg-spark-runtime
jar, so the integration test self-skips; the gate logic itself must work
everywhere — a mis-gate on a real cluster would either refuse a working
catalog or write through a missing one."""

from __future__ import annotations

import pytest

from flowforge import iceberg


def test_no_catalog_detected_in_sandbox(spark):
    assert iceberg.iceberg_catalogs(spark) == []


def test_require_iceberg_error_names_the_config(spark):
    with pytest.raises(RuntimeError, match=r"spark\.sql\.catalog\.<name>"):
        iceberg.require_iceberg(spark)


def test_gated_entry_points_refuse_without_catalog(spark, tmp_path):
    with pytest.raises(RuntimeError):
        iceberg.read_table(spark, "cat.db.pages")
    with pytest.raises(RuntimeError):
        iceberg.mirror_lineage(spark, str(tmp_path), "cat.db.lineage")
    with pytest.raises(RuntimeError):
        iceberg.mirror_compression_report(spark, str(tmp_path), "cat.db.rep")


def test_catalog_detection_matches_iceberg_values_only():
    """Pure matcher logic via a stub conf — no Spark restart needed."""

    class _Conf:
        def getAll(self):
            return [
                ("spark.sql.catalog.ice",
                 "org.apache.iceberg.spark.SparkCatalog"),
                ("spark.sql.catalog.ice.type", "hadoop"),
                ("spark.sql.catalog.other", "com.example.NotIcebergCatalog"),
                ("spark.master", "local[4]"),
            ]

    class _SC:
        def getConf(self):
            return _Conf()

    class _Spark:
        sparkContext = _SC()

    assert iceberg.iceberg_catalogs(_Spark()) == ["ice"]


def test_identifier_validation():
    assert iceberg._check_ident("cat.db.table") == "cat.db.table"
    assert iceberg._check_ident("db.table") == "db.table"
    for bad in ("cat.db.ta ble", "a.b.c.d", "x;drop", "", "a.`b`.c"):
        with pytest.raises(ValueError):
            iceberg._check_ident(bad)


def test_iceberg_integration_when_available(spark, tmp_path):
    """Full read→encode→mirror loop; runs only where an Iceberg catalog is
    configured (real cluster), otherwise records an explicit skip."""
    if not iceberg.iceberg_catalogs(spark):
        pytest.skip("no Iceberg catalog configured in this session")
    from flowforge import datagen, engine

    cat = iceberg.require_iceberg(spark)
    src = spark.createDataFrame(datagen.make_webpages(200).to_pandas())
    src.writeTo(f"{cat}.db.pages").using("iceberg").createOrReplace()
    out = str(tmp_path / "store")
    iceberg.encode_table(spark, f"{cat}.db.pages", out, buckets=4)
    assert engine.decode_table(spark, out).count() == 200
    iceberg.mirror_lineage(spark, out, f"{cat}.db.pages_lineage")
    assert spark.table(f"{cat}.db.pages_lineage").count() > 0
