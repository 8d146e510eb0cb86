"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``parquetaivectorsearch_spark`` — this module is
the thin driver-facing shim.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from parquetaivectorsearch_spark import queries as Q  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: exact top-20 KNN of corpus row 0 by
    dot-product distance over `embeddings` — the reference pipeline's
    search phase (Program.cs:207-227), Spark-first."""
    return Q.QUERIES["knn_topk"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; approx/UDF-backed ops are omitted →
    rows-only check (SURVEY.md §5)."""
    return Q.all_oracles()
