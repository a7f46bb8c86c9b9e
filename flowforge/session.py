"""SparkSession builder with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "flowforge", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # shuffle spill dir: tmpfs when available — on a real cluster shuffle
    # I/O bandwidth scales with node count; a single box's disk does not,
    # so /dev/shm is the honest proxy for per-node local SSDs
    local_dir = os.environ.get(
        "FLOWFORGE_LOCAL_DIR",
        "/dev/shm/flowforge-spark" if os.path.isdir("/dev/shm") else None,
    )
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.parquet.columnarReaderBatchSize", "16384")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("FLOWFORGE_DRIVER_MEM", "8g"))
    )
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
