"""Fixture-table catalog: one parquet file per table under an sf dir.

The reference hardcodes a single directory of dbpedia parquet files
(Program.cs:13-14,31); here the "catalog" is any sf dir with the ten
driver tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
