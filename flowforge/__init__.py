"""flowforge — a PySpark-native per-column lightweight-compression engine.

A from-scratch batch columnar encoder over web-page tables
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``:
each column is encoded per partition chunk via vectorized Arrow kernels
(dictionary, RLE, frame-of-reference + bit-packing, delta+zigzag, an
FSST-style symbol-table compressor, and an RLE/dict-or-FSST hybrid), with a
stats-driven codec auto-selector. Partitioning is explicit (salted
repartition by url hash), encoded chunks carry per-partition lineage and
size/throughput metrics, and interrupted runs resume from the last
committed bucket.

Capability parity target: flowtracex/zeek-kafka-parquet (a Go
Kafka -> normalize -> Parquet ETL pipeline; see SURVEY.md). This package
re-expresses that pipeline's essence — schema-driven per-column typed
columnar encoding of semi-structured records, partitioned by key, with
buffered resumable writes and throughput metrics — Spark-first.
"""

__version__ = "0.1.0"
