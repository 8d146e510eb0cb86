"""Compaction: many small files → few, data intact, original safe on crash
path (tmp-dir + rename swap)."""

from __future__ import annotations

import tempfile

from parquetaivectorsearch_spark.sources import load_table
from parquetaivectorsearch_spark.sources.compact import compact_parquet, dir_stats
from tests.conftest import SF_SMOKE


def test_compact_reduces_files_keeps_rows(spark):
    d = tempfile.mkdtemp(prefix="compact_") + "/t"
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.repartition(40).write.parquet(d)  # fragment: 40 small files
    n_rows = docs.count()
    _, before = dir_stats(spark, d)
    assert before == 40
    b, a = compact_parquet(spark, d, target_file_bytes=64 * 1024 * 1024)
    assert (b, a) == (40, 1)
    assert spark.read.parquet(d).count() == n_rows


def test_compact_preserves_partition_layout(spark):
    d = tempfile.mkdtemp(prefix="compactp_") + "/t"
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.repartition(20).write.partitionBy("lang").parquet(d)
    n_rows = docs.count()
    b, a = compact_parquet(spark, d, target_file_bytes=64 * 1024 * 1024,
                           partition_by="lang")
    assert a < b
    out = spark.read.parquet(d)
    assert out.count() == n_rows
    assert "lang" in out.columns  # partition column survived the rewrite
