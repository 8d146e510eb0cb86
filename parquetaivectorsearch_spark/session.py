"""SparkSession factory tuned for the engine.

Local-mode defaults mirror the test/bench environment (``local[$SPARK_GRAFT_CPUS]``)
but every knob is the one you would also set on a real cluster:

- AQE on: runtime join-strategy switch, skew-join splitting, partition
  coalescing — the cluster-scale answer to the reference's hand-tuned
  ``MaxDegreeOfParallelism`` (Program.cs:33-37).
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a 1000-executor
  cluster this would be ~2-3× total cores (AQE coalesces the excess).
- Arrow enabled for all pandas-UDF exchange (the batched-amortization idea of
  the reference's BATCHSIZE=10k, Program.cs:16, for free).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "parquetaivectorsearch_spark", *, cpus: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
