"""Kafka wiring (no broker; no Kafka jar in this sandbox): option dicts
match the reference's consumer/producer semantics, the S2 detection cascade
and nested unwrap work on static frames, and message assembly produces the
3-layer keyed shape."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flowforge.kafka import (  # noqa: E402
    KafkaConfig,
    detect_log_type,
    messages_to_mixed,
    producer_frame,
    reader_options,
    writer_options,
)
from flowforge.logtypes import LogTypeRegistry  # noqa: E402


def test_reader_options_reference_parity():
    """core/kafka.go:44-48: topic/group/MinBytes 10KB/MaxBytes 10MB."""
    opts = reader_options(KafkaConfig(brokers="b1:9092,b2:9092"))
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "zeek-raw"
    assert opts["kafka.group.id"] == "flowforge"
    assert opts["kafka.fetch.min.bytes"] == str(10 * 1024)
    assert opts["kafka.fetch.max.bytes"] == str(10 * 1024 * 1024)
    opts = reader_options(KafkaConfig(max_offsets_per_trigger=50_000))
    assert opts["maxOffsetsPerTrigger"] == "50000"


def test_writer_options_reference_parity():
    """core/kafka_producer.go:119-141: compression + linger batching."""
    opts = writer_options(KafkaConfig(compression="zstd", output_topic="out"))
    assert opts["kafka.compression.type"] == "zstd"
    assert opts["topic"] == "out"
    assert opts["kafka.linger.ms"] == "10"


def test_detect_log_type_cascade(spark):
    """core/kafka.go:92-124: nested single-key, else log_type, else _path."""
    rows = [
        ('{"dns": {"ts": 1.0, "query": "x"}}',),            # nested
        ('{"log_type": "conn", "ts": 2.0}',),               # flat
        ('{"_path": "http", "ts": 3.0}',),                  # zeek _path
        ('{"nonsense": {"a": 1}, "b": 2}',),                # none -> null
    ]
    df = spark.createDataFrame(rows, ["value"])
    known = ["conn", "dns", "http", "ssl", "ssh"]
    got = [r[0] for r in df.select(detect_log_type(F.col("value"), known)).collect()]
    assert got == ["dns", "conn", "http", None]


def test_kafka_messages_through_registry(spark):
    """End-to-end minus the broker: raw Kafka values (nested AND flat) ->
    detection -> typed demux+normalize via the registry."""
    reg = LogTypeRegistry.from_config_file()
    rows = [
        ('{"dns": {"ts": 1767225600.0, "uid": "D1", "id.orig_h": "10.0.0.1", '
         '"id.resp_h": "1.1.1.1", "proto": "udp"}}',),
        ('{"log_type": "conn", "ts": 1767225601.0, "uid": "K1", '
         '"id.orig_h": "10.0.0.2", "id.resp_h": "8.8.8.8", "id.resp_p": 443}',),
        ('{"log_type": "bogus", "ts": 1.0}',),  # unknown -> dropped
    ]
    df = spark.createDataFrame(rows, ["value"])
    mixed = messages_to_mixed(df, reg.known_types())
    out = {r["flow_id"]: r for r in
           reg.demux_normalize(mixed, unwrap_nested=True).collect()}
    assert set(out) == {"D1", "K1"}
    assert out["D1"]["log_type"] == "dns" and out["D1"]["protocol"] == "udp"
    assert out["K1"]["dst_port"] == 443
    assert out["D1"]["event_time"] == 1767225600000


def test_producer_frame_shape(spark):
    """K5: key = log_type, value = 3-layer JSON (kafka_producer.go:15-96)."""
    import json

    reg = LogTypeRegistry.from_config_file()
    raw = spark.createDataFrame(
        [("conn", '{"ts": 1767225600.0, "uid": "C1", "id.orig_h": "10.0.0.1", '
                  '"id.resp_h": "8.8.8.8", "id.resp_p": 53, "proto": "udp"}')],
        ["log_type", "raw"])
    normalized = reg.demux_normalize(raw)
    msg = producer_frame(normalized).collect()[0]
    assert msg["key"] == "conn"
    v = json.loads(msg["value"])
    assert v["source"] == "flowforge" and v["log_type"] == "conn"
    assert set(v) == {"source", "log_type", "raw", "normalized", "enriched"}
    assert v["normalized"]["flow_id"] == "C1"
    assert v["normalized"]["event_time"] == 1767225600000
    assert v["enriched"]["event_year"] == 2026


def test_stream_encode_kafka_requires_config(spark, tmpdir_clean):
    import os

    import pytest

    from flowforge import datagen, streaming

    src = os.path.join(tmpdir_clean, "src")
    os.makedirs(src)
    import pyarrow.parquet as pq

    pq.write_table(datagen.make_webpages(50, seed=1), os.path.join(src, "a.parquet"))
    with pytest.raises(ValueError, match="KafkaConfig"):
        streaming.stream_encode(spark, src, os.path.join(tmpdir_clean, "out"),
                                source="kafka")
