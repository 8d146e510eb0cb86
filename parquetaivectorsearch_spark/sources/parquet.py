"""Parquet source/sink helpers (SURVEY.md §2.1).

Everything the reference implements by hand — directory glob
(Program.cs:31), parallel file reads (Program.cs:33-43), row-group columnar
decode (Program.cs:65-75) — is Spark's FileSourceScanExec + vectorized
parquet reader; these helpers only add the pieces it *skips*: an explicit
expected-schema assertion and schema introspection as a DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T


def scan_parquet_dir(spark: SparkSession, path: str,
                     expected_schema: T.StructType | None = None,
                     columns: list[str] | None = None) -> DataFrame:
    """Scan a parquet file/dir/glob with an optional schema assertion.

    The reference walks footer metadata but never branches on it
    ("should be the same" comment, Program.cs:50-63); at 100 TB a drifted
    file should fail fast instead, so assert when a schema is given.
    """
    df = spark.read.parquet(path)
    if expected_schema is not None:
        got = {f.name: f.dataType for f in df.schema.fields}
        want = {f.name: f.dataType for f in expected_schema.fields}
        if got != want:
            raise ValueError(f"schema mismatch at {path}: got {got}, want {want}")
    if columns:
        df = df.select(*columns)  # column pruning reaches the scan (ReadSchema)
    return df


def schema_table(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Schema introspection as a queryable DataFrame (Program.cs:51-63's
    metadata walk, minus the println). Driver-side metadata only — no scan."""
    rows = [
        Row(ordinal=i, col_name=f.name, col_type=f.dataType.simpleString(),
            nullable=bool(f.nullable))
        for i, f in enumerate(df.schema.fields)
    ]
    schema = T.StructType([
        T.StructField("ordinal", T.IntegerType(), False),
        T.StructField("col_name", T.StringType(), False),
        T.StructField("col_type", T.StringType(), False),
        T.StructField("nullable", T.BooleanType(), False),
    ])
    return spark.createDataFrame(rows, schema)


def write_json_sample(df: DataFrame, path: str, n: int = 100) -> None:
    """Reference's 100-row JSON dump (Program.cs:102-103) as JSON-lines.

    ``limit(n)`` short-circuits the scan (CollectLimit) — no full pass."""
    df.limit(n).coalesce(1).write.mode("overwrite").json(path)


def scan_csv(spark: SparkSession, path: str,
             schema: T.StructType | str | None = None) -> DataFrame:
    """CSV source for text corpora (SURVEY §2.1 X). An explicit schema skips
    the inference pass — at 100 TB, inference is a full extra scan."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def scan_json(spark: SparkSession, path: str,
              schema: T.StructType | str | None = None) -> DataFrame:
    """JSON-lines source; same explicit-schema guidance as scan_csv."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
