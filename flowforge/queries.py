"""Driver-contract queries: each has a Spark builder here and a DuckDB
oracle in __spark_entry__.py. Column names/aliases match the oracles
exactly (the driver hash-compares values after sorting columns by name).

Two families:
1. round-trip queries — encode a testdata table into a chunk store, decode
   it, and aggregate/fingerprint the DECODED data; the oracle runs the same
   aggregation on the SOURCE table, so a value-hash match proves the
   engine's encode->decode is lossless (the reference's raw_log oracle made
   exact, SURVEY §5);
2. expression queries — reference-parity normalize/enrich expressions over
   `events` (SURVEY §2 P1-P4, E1-E5, F1, R1).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import engine
from .functions import enrich

STORE_ROOT = "/tmp/flowforge_stores"

# deterministic synthetic IPs/ports over events (modulo arithmetic only, so
# the oracle SQL is identical); mix covers all four direction branches and
# the full 15-entry service map + unknown
SRC_IP_SQL = (
    "CASE WHEN user_id % 5 < 3 THEN "
    "'10.' || CAST(user_id % 250 AS STRING) || '.' || CAST((user_id * 7) % 250 AS STRING) || '.' || CAST(1 + user_id % 250 AS STRING) "
    "ELSE '203.' || CAST(user_id % 250 AS STRING) || '.' || CAST((user_id * 3) % 250 AS STRING) || '.' || CAST(1 + user_id % 250 AS STRING) END"
)
DST_IP_SQL = (
    "CASE WHEN event_id % 4 = 0 THEN "
    "'192.168.' || CAST(event_id % 250 AS STRING) || '.' || CAST(1 + event_id % 250 AS STRING) "
    "WHEN event_id % 4 = 1 THEN "
    "'172.' || CAST(16 + event_id % 16 AS STRING) || '.' || CAST(event_id % 250 AS STRING) || '.' || CAST(1 + event_id % 250 AS STRING) "
    "ELSE '8.8.' || CAST(event_id % 250 AS STRING) || '.' || CAST(1 + event_id % 250 AS STRING) END"
)
PORT_LIST = [53, 80, 443, 22, 25, 587, 993, 995, 1433, 3306, 5432, 3389, 5900, 8080, 8443, 12345]
DST_PORT_SQL = (
    "element_at(ARRAY(" + ", ".join(str(p) for p in PORT_LIST) + "), CAST(1 + event_id % 16 AS INT))"
)
# DuckDB uses [] literals; Spark uses array() — keep two renderings
DST_PORT_SQL_DUCK = (
    "[" + ", ".join(str(p) for p in PORT_LIST) + "][CAST(1 + event_id % 16 AS INT)]"
)


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _store_path(sf_dir: str, table: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(STORE_ROOT, f"{table}_{tag}")


def decoded(spark: SparkSession, sf_dir: str, table: str, salt_col: str) -> DataFrame:
    """Encode the testdata table into a cached chunk store (resume makes
    repeat calls a no-op) and return the decoded DataFrame."""
    out = _store_path(sf_dir, table)
    df = _table(spark, sf_dir, table)
    engine.run_encode(spark, df, out, salt_col=salt_col)
    return engine.decode_table(spark, out)


# --- round-trip family -------------------------------------------------------

def q_roundtrip_doc_text_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = decoded(spark, sf_dir, "documents", "doc_id")
    return d.select("doc_id", F.md5("text").alias("text_md5"))


def q_roundtrip_doc_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = decoded(spark, sf_dir, "documents", "doc_id")
    return (
        d.groupBy("lang", "source")
        .agg(F.count("*").alias("cnt"), F.sum("n_chars").alias("sum_chars"))
    )


def q_roundtrip_events_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = decoded(spark, sf_dir, "events", "event_id")
    return d.select(
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.floor(F.col("value") * 100).alias("value_c"),
        F.md5(F.concat_ws("|", "event_type", "props")).alias("row_md5"),
    )


# --- reference-parity expression family ---------------------------------------

def q_normalize_promote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P3: rename/promote + ms cast + static injection over events."""
    e = _table(spark, sf_dir, "events")
    return e.select(
        F.col("event_id").alias("flow_id"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("event_time"),
        F.col("event_type").alias("protocol"),
        F.lit("events").alias("event_class"),
        F.col("user_id").cast("int").alias("src_port"),
    )


def q_enrich_time_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: time-part enrichment (weekday Sunday=0 per Go parity)."""
    e = _table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    parts = enrich.time_parts(ms)
    return e.select("event_id", *[c.alias(n) for n, c in parts.items()])


def q_enrich_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2+E3: private-IP predicate + direction over synthetic IPs."""
    e = _table(spark, sf_dir, "events")
    e = e.withColumn("src_ip", F.expr(SRC_IP_SQL)).withColumn("dst_ip", F.expr(DST_IP_SQL))
    src_p = enrich.is_private_ip(F.col("src_ip"))
    dst_p = enrich.is_private_ip(F.col("dst_ip"))
    return e.select(
        "event_id", "src_ip", "dst_ip",
        src_p.alias("src_ip_is_private"),
        dst_p.alias("dst_ip_is_private"),
        enrich.direction(src_p, dst_p).alias("direction"),
    )


def q_enrich_service(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4+E5: port->service map with protocol fallback."""
    e = _table(spark, sf_dir, "events")
    port = F.expr(DST_PORT_SQL)
    # model "dst_port missing" (<=0) for a slice of rows: every 7th event
    port = F.when(F.pmod("event_id", F.lit(7)) == 0, F.lit(0)).otherwise(port)
    return e.select(
        "event_id",
        port.cast("int").alias("dst_port"),
        enrich.service(port, F.col("event_type")).alias("service"),
    )


def q_filter_known_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: drop unknown types, then per-type counts (R1 demux accounting)."""
    e = _table(spark, sf_dir, "events")
    known = ["click", "view", "purchase"]
    return (
        e.filter(F.col("event_type").isin(known))
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.sum(F.floor(F.col("value") * 100)).alias("sum_value_c"))
    )


def q_route_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: keyed routing -> per-bucket counts (channel-per-type analog)."""
    e = _table(spark, sf_dir, "events")
    return (
        e.withColumn("bucket", F.pmod("event_id", F.lit(8)))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"), F.countDistinct("user_id").alias("users"))
    )
