"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: encode the sf0.001 ``documents`` table through
the full engine (salted repartition -> mapInArrow codec kernels -> chunk
store), decode it back, and return the per-column compression report with a
bit-identity verdict.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2; DuckDB runs the oracle on the same parquet views. Round-trip
queries aggregate the DECODED table, so a hash match against the source
proves lossless encode/decode.
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flowforge import engine
from flowforge import queries as Q
from flowforge.functions.enrich import SERVICE_MAP


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    sf_dir = "/root/testdata/sf0.001"
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tempfile.mkdtemp(prefix="flowforge_entry_")
    try:
        engine.run_encode(spark, src, out, salt_col="doc_id", buckets=8)
        decoded = engine.decode_table(spark, out)
        diffs = decoded.exceptAll(src).count() + src.exceptAll(decoded).count()
        report = engine.compression_report(spark, out)
        return report.withColumn("bit_identical", F.lit(diffs == 0)).select(
            "column", "bytes_in", "bytes_out", "ratio", "codecs", "bit_identical"
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "roundtrip_doc_text_md5": Q.q_roundtrip_doc_text_md5,
        "roundtrip_doc_lang_counts": Q.q_roundtrip_doc_lang_counts,
        "roundtrip_events_fingerprint": Q.q_roundtrip_events_fingerprint,
        "normalize_promote": Q.q_normalize_promote,
        "enrich_time_parts": Q.q_enrich_time_parts,
        "enrich_network": Q.q_enrich_network,
        "enrich_service": Q.q_enrich_service,
        "filter_known_types": Q.q_filter_known_types,
        "route_buckets": Q.q_route_buckets,
    }


def oracle_sql() -> dict[str, str]:
    src_ip = Q.SRC_IP_SQL.replace(" AS STRING", " AS VARCHAR")
    dst_ip = Q.DST_IP_SQL.replace(" AS STRING", " AS VARCHAR")
    dst_port = Q.DST_PORT_SQL_DUCK
    private = lambda ip: (  # noqa: E731 — RFC1918 on a synthesized IPv4 expr
        f"(string_split({ip}, '.')[1]::INT = 10 "
        f"OR (string_split({ip}, '.')[1]::INT = 172 AND string_split({ip}, '.')[2]::INT BETWEEN 16 AND 31) "
        f"OR (string_split({ip}, '.')[1]::INT = 192 AND string_split({ip}, '.')[2]::INT = 168))"
    )
    service_case = " ".join(
        f"WHEN dst_port = {p} THEN '{s}'" for p, s in SERVICE_MAP.items()
    )
    return {
        "roundtrip_doc_text_md5": (
            "SELECT doc_id, md5(text) AS text_md5 FROM documents"
        ),
        "roundtrip_doc_lang_counts": (
            "SELECT lang, source, CAST(count(*) AS BIGINT) AS cnt, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY lang, source"
        ),
        "roundtrip_events_fingerprint": (
            "SELECT event_id, epoch_ms(ts) AS ts_ms, "
            "CAST(floor(value * 100) AS BIGINT) AS value_c, "
            "md5(event_type || '|' || props) AS row_md5 FROM events"
        ),
        "normalize_promote": (
            "SELECT event_id AS flow_id, epoch_ms(ts) AS event_time, "
            "event_type AS protocol, 'events' AS event_class, "
            "CAST(user_id AS INT) AS src_port FROM events"
        ),
        "enrich_time_parts": (
            "SELECT event_id, CAST(year(ts) AS INT) AS event_year, "
            "CAST(month(ts) AS INT) AS event_month, "
            "CAST(day(ts) AS INT) AS event_day, "
            "CAST(hour(ts) AS INT) AS event_hour, "
            "CAST(date_part('dow', ts) AS INT) AS event_weekday FROM events"
        ),
        "enrich_network": (
            f"WITH ips AS (SELECT event_id, {src_ip} AS src_ip, {dst_ip} AS dst_ip FROM events) "
            f"SELECT event_id, src_ip, dst_ip, "
            f"{private('src_ip')} AS src_ip_is_private, "
            f"{private('dst_ip')} AS dst_ip_is_private, "
            f"CASE WHEN {private('src_ip')} AND NOT {private('dst_ip')} THEN 'outbound' "
            f"WHEN NOT {private('src_ip')} AND {private('dst_ip')} THEN 'inbound' "
            f"WHEN {private('src_ip')} AND {private('dst_ip')} THEN 'internal' "
            f"ELSE 'external' END AS direction FROM ips"
        ),
        "enrich_service": (
            f"WITH p AS (SELECT event_id, "
            f"CASE WHEN event_id % 7 = 0 THEN 0 ELSE {dst_port} END AS dst_port, "
            f"event_type FROM events) "
            f"SELECT event_id, CAST(dst_port AS INT) AS dst_port, "
            f"CASE WHEN dst_port > 0 THEN (CASE {service_case} ELSE 'unknown' END) "
            f"ELSE event_type END AS service FROM p"
        ),
        "filter_known_types": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS cnt, "
            "CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c "
            "FROM events WHERE event_type IN ('click','view','purchase') "
            "GROUP BY event_type"
        ),
        "route_buckets": (
            "SELECT event_id % 8 AS bucket, CAST(count(*) AS BIGINT) AS cnt, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS users "
            "FROM events GROUP BY event_id % 8"
        ),
    }
