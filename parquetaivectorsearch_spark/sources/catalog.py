"""Fixture-table catalog: one parquet file per table under an sf dir.

The reference hardcodes a single directory of dbpedia parquet files
(Program.cs:13-14,31); here the "catalog" is any sf dir with the ten
driver tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain ``spark.read.parquet`` — Catalyst owns
    split planning, vectorized decode, pushdown, pruning (the reference's
    hand-rolled Parallel.ForEach + LogicalReader loop, Program.cs:33-75)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    from parquetaivectorsearch_spark.session import ship_package

    ship_package(spark)  # UDF queries must import this package on workers
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS) — Spark's vectorized reader
    rejects it (PARQUET_TYPE_ILLEGAL). Read nanos as int64 and rebuild a
    TIMESTAMP_NTZ with *integer* µs arithmetic:

    - ``ts DIV 1000``, not ``ts/1000``: epoch-nanos (~1.7e18) exceed 2^53,
      so double division silently corrupts microseconds;
    - ``timestampadd`` onto an NTZ epoch base, not ``timestamp_micros``
      (which is LTZ and would shift with the session timezone).

    Fixture nanos are all µs-aligned (checked in tests), so this is
    lossless and matches DuckDB's TIMESTAMP(µs) view of the same file.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn(
        "ts",
        F.expr("timestampadd(MICROSECOND, ts DIV 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
    )


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
