"""Python DataSource API (Spark 4): a custom partitioned batch source.

The reference's only source is a hand-rolled parallel parquet scanner
(Program.cs:31-43); Spark covers that natively, but a real engine also needs
the *extension point* — plugging a new source format in without touching the
JVM. `SequenceDataSource` is the minimal complete example: deterministic
synthetic rows, split across `parts` input partitions that executors read
independently (the Python-worker analog of FileSourceScanExec's file splits).

The row function is a pure hash of the id, so any partitioning produces the
same set — partition count is a parallelism knob, not a semantic one, which
is exactly the contract a 100 TB source must satisfy.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import LongType, StructField, StructType

_MULT = 2654435761  # Knuth multiplicative hash constant (public domain)


def seq_value(i: int) -> int:
    """Deterministic per-id payload; mirrored in the DuckDB oracle."""
    return (i * _MULT) % 100003


class _SeqPartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _SeqReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        step = max(1, (self.n + self.parts - 1) // self.parts)
        return [
            _SeqPartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _SeqPartition):
        for i in range(partition.start, partition.end):
            yield (i, seq_value(i))


class SequenceDataSource(DataSource):
    """spark.read.format("seqsource").option("n", N).option("parts", P)."""

    @classmethod
    def name(cls) -> str:
        return "seqsource"

    def schema(self):
        return StructType([
            StructField("id", LongType(), False),
            StructField("val", LongType(), False),
        ])

    def reader(self, schema) -> _SeqReader:
        return _SeqReader(self.options)
