"""Skew handling evidence: the input has real host-level skew (Zipf hosts,
FIXTURES.md §1), and the salted url-hash repartition defuses it — bucket
sizes stay near-uniform regardless (north rule: 'salted repartitioning by
url-hash to defuse host-level skew')."""

from __future__ import annotations

import collections
import statistics
import sys
from urllib.parse import urlparse

sys.path.insert(0, "/root/repo")

from flowforge import datagen, engine  # noqa: E402

ROWS = 20_000
BUCKETS = 16


def test_input_hosts_are_skewed():
    tbl = datagen.make_webpages(ROWS, seed=42)
    hosts = collections.Counter(
        urlparse(u).netloc for u in tbl.column("url").to_pylist()
    )
    counts = sorted(hosts.values(), reverse=True)
    mean = ROWS / len(counts)
    # Zipf(1.2): the hottest host must dwarf the mean — this is the skew
    # that naive partition-by-host would turn into a straggler task
    assert counts[0] > 10 * mean, (counts[0], mean)


def test_salted_buckets_are_balanced(spark, tmpdir_clean):
    import pyarrow.parquet as pq
    import os

    src = os.path.join(tmpdir_clean, "src.parquet")
    pq.write_table(datagen.make_webpages(ROWS, seed=42), src)
    df = spark.read.parquet(src)
    metrics = engine.run_encode(
        spark, df, os.path.join(tmpdir_clean, "store"), buckets=BUCKETS
    )
    per_bucket = {m["bucket"]: m["n_rows"] for m in metrics if m["column"] == "url"}
    assert len(per_bucket) == BUCKETS
    sizes = list(per_bucket.values())
    med = statistics.median(sizes)
    # url-hash is uniform over unique urls: no bucket may exceed ~1.25x the
    # median even though the hottest HOST holds >10x the mean host load
    assert max(sizes) < 1.25 * med, sorted(sizes)
    assert min(sizes) > 0.75 * med, sorted(sizes)
