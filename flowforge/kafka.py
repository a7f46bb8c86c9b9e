"""Kafka source/sink wiring (config-selected; no broker in this sandbox).

The reference's defining source is a consumer-group Kafka reader whose
auto-committed offsets are the resume point (core/kafka.go:42-140), and its
second sink is a JSON producer keyed by log_type with configurable
compression and batching (core/kafka_producer.go:119-201). This module
emits the exact ``format("kafka")`` reader/writer configuration for those
semantics so a user with a broker switches it on with
``stream_encode(..., source="kafka", kafka=KafkaConfig(...))`` — nothing
else in the engine changes (the chunk-store commit protocol already gives
exactly-once downstream of any replayed source).

No Kafka jar ships with this sandbox's PySpark (verified in SURVEY §0), so
``.load()`` would fail here; everything up to it — option dicts, the S2
log-type detection cascade, message assembly — is pure DataFrame code and
is unit-tested against static frames.

Reference parity map:
- bootstrap/topic/group    core/kafka.go:44-46   kafka.bootstrap.servers,
  subscribe, kafka.group.id
- MinBytes 10KB/MaxBytes 10MB  core/kafka.go:47-48  kafka.fetch.min.bytes,
  kafka.fetch.max.bytes
- auto-commit offsets = resume  core/kafka.go:73  -> checkpointLocation
  (Spark tracks offsets in the checkpoint; more precise than auto-commit)
- log-type detection cascade  core/kafka.go:79-124  :func:`detect_log_type`
- key = log_type  core/kafka_producer.go:188-190  sink key column
- compression none/gzip/snappy/lz4/zstd  core/kafka_producer.go:119-131
  kafka.compression.type
- batch 100 msgs / linger 10ms  core/kafka_producer.go:138-140
  kafka.linger.ms (batch.size is byte-based in the client; the reference's
  message-count batching has no exact knob — linger dominates in practice)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class KafkaConfig:
    brokers: str = "localhost:9092"
    topic: str = "zeek-raw"
    group_id: str = "flowforge"
    starting_offsets: str = "earliest"
    fetch_min_bytes: int = 10 * 1024          # core/kafka.go:47
    fetch_max_bytes: int = 10 * 1024 * 1024   # core/kafka.go:48
    max_offsets_per_trigger: int | None = None
    # producer side
    output_topic: str = "zeek-normalized"
    compression: str = "lz4"                  # config/config.json:18
    linger_ms: int = 10                       # core/kafka_producer.go:139


def reader_options(cfg: KafkaConfig) -> dict[str, str]:
    opts = {
        "kafka.bootstrap.servers": cfg.brokers,
        "subscribe": cfg.topic,
        "kafka.group.id": cfg.group_id,
        "startingOffsets": cfg.starting_offsets,
        "kafka.fetch.min.bytes": str(cfg.fetch_min_bytes),
        "kafka.fetch.max.bytes": str(cfg.fetch_max_bytes),
        "failOnDataLoss": "false",
    }
    if cfg.max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(cfg.max_offsets_per_trigger)
    return opts


def writer_options(cfg: KafkaConfig) -> dict[str, str]:
    return {
        "kafka.bootstrap.servers": cfg.brokers,
        "topic": cfg.output_topic,
        "kafka.compression.type": cfg.compression,
        "kafka.linger.ms": str(cfg.linger_ms),
    }


def detect_log_type(value: Column, known: list[str]) -> Column:
    """S2 detection cascade (core/kafka.go:92-124): nested single-key form
    ``{"dns": {...}}`` first, else flat ``log_type`` field, else ``_path``."""
    keys = F.json_object_keys(value)
    nested = F.when(
        (F.size(keys) == 1) & F.element_at(keys, 1).isin(known),
        F.element_at(keys, 1),
    )
    return F.coalesce(
        nested,
        F.get_json_object(value, "$.log_type"),
        F.get_json_object(value, "$._path"),
    )


def messages_to_mixed(df: DataFrame, known: list[str],
                      value_col: str = "value") -> DataFrame:
    """Kafka records -> the ``(log_type, raw)`` mixed stream that
    LogTypeRegistry.demux_normalize consumes (with unwrap_nested=True so
    each type branch unwraps its own nested payload)."""
    value = F.col(value_col).cast("string")
    return df.select(
        detect_log_type(value, known).alias("log_type"),
        value.alias("raw"),
    )


def build_stream_reader(spark, cfg: KafkaConfig):
    """The configured (unstarted) Kafka stream reader. Calling ``.load()``
    requires spark-sql-kafka on the classpath."""
    reader = spark.readStream.format("kafka")
    for k, v in reader_options(cfg).items():
        reader = reader.option(k, v)
    return reader


def producer_frame(df: DataFrame, log_type_col: str = "log_type",
                   source: str = "flowforge") -> DataFrame:
    """K5 message assembly: key = log_type, value = 3-layer JSON
    {source, log_type, raw{}, normalized{}, enriched{}}
    (core/kafka_producer.go:15-96). Columns are split into layers by the
    canonical-name convention the registry produces."""
    normalized_cols = [c for c in df.columns if c in (
        "flow_id", "event_time", "src_ip", "dst_ip", "src_port", "dst_port",
        "protocol", "service", "event_type", "event_class")]
    enriched_cols = [c for c in df.columns if c.startswith("event_")
                     and c not in ("event_time", "event_type", "event_class")]
    raw_cols = [c for c in df.columns
                if c not in normalized_cols and c not in enriched_cols
                and c != log_type_col]
    # empty layers serialize as {} via an empty map — independent of any
    # session-level jsonGenerator conf (ADVICE r02); ignoreNullFields is
    # pinned explicitly for the same reason (the reference's Go marshaller
    # omits absent fields, core/kafka_producer.go:15-96)
    empty = F.from_json(F.lit("{}"), "map<string,string>")
    layer = lambda cols: F.struct(*[F.col(c) for c in cols]) if cols else empty  # noqa: E731
    value = F.to_json(
        F.struct(
            F.lit(source).alias("source"),
            F.col(log_type_col).alias("log_type"),
            layer(raw_cols).alias("raw"),
            layer(normalized_cols).alias("normalized"),
            layer(enriched_cols).alias("enriched"),
        ),
        {"ignoreNullFields": "true"},
    )
    return df.select(F.col(log_type_col).alias("key"), value.alias("value"))


def write_stream_kafka(df: DataFrame, cfg: KafkaConfig, checkpoint: str):
    """The configured (unstarted) Kafka sink for a (key, value) frame."""
    writer = df.writeStream.format("kafka").option("checkpointLocation", checkpoint)
    for k, v in writer_options(cfg).items():
        writer = writer.option(k, v)
    return writer
