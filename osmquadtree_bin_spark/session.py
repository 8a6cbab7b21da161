"""SparkSession factory tuned for this engine.

Arrow is enabled everywhere (all custom kernels are pandas/Arrow UDFs —
BASELINE.json ``input_hint``: no per-row Python). AQE is on so skewed tile
joins get runtime splitting on top of our explicit salting. In production the
warehouse is an Iceberg catalog; in this sandbox (no Iceberg runtime jar) the
same layout is written as hive-style partitioned parquet, which preserves the
partition-pruning behaviour the engine relies on.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "osmquadtree-bin-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # ParallelGC: G1 measurably anti-scales allocation-heavy codegen
        # stages in local mode (15s@16 threads vs 6s with ParallelGC on the
        # same stage) — throughput GC fits a batch engine
        .config(
            "spark.driver.extraJavaOptions",
            "-Djava.io.tmpdir=/tmp -XX:+UseParallelGC",
        )
    )
    return builder.getOrCreate()
