"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for the 100TB design point (SURVEY.md §4.2): AQE with skew-join
handling, Arrow everywhere (all Python compute is pandas/Arrow UDFs —
BASELINE.json:15), small Arrow batches because image `bytes` rows are MBs,
and explicit shuffle-partition sizing. On this box Spark runs local[N]
(single JVM); the same conf applies unchanged under spark-submit on a real
cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "tilers-tools-spark", master: str | None = None, shuffle_partitions: int | None = None, extra: dict | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.fallback.enabled", "false")
        # Arrow batch sizing (SURVEY.md §7 M6): the BYTES cap is what bounds
        # image rows (multi-MB binary payloads -> ~10 rows/batch at 32MB);
        # the RECORDS cap stays at the 10k default so narrow-row UDF stages
        # (h3/s2 assign, PIP refine) aren't shredded into thousands of tiny
        # kernel calls (a global 64-record cap cost ~3s per 100k-row UDF
        # stage in per-call overhead alone)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "33554432")
        # engine does uint64-style bit math on longs in a few column exprs
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.sql.files.maxPartitionBytes", "268435456")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
