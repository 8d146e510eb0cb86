"""Strict Spark ↔ DuckDB oracle parity for every registered query.

This replicates the driver's t2 gate: row count, column names, and an
order-insensitive *representation-sensitive* value hash. The driver's hash
distinguishes Decimal('123.4500') from 123.45 even when values are equal
(CORRECTNESS_r01: all five hash failures were DECIMAL-output queries), so:

- no registered query may emit DecimalType in its final schema
  (``_assert_no_decimal``), and
- values are compared via a canonical per-cell repr that does NOT coerce
  dtypes across engines (ints are width-insensitive — int32 vs int64 both
  canonicalize to the integer string — but Decimal-vs-float fails).
"""

from __future__ import annotations

import datetime
import decimal
import math

import numpy as np
import pandas as pd
import pytest

from parquetaivectorsearch_spark import queries as Q
from pyspark.sql import types as T
from tests.conftest import SF_CORRECT, register_views


def _assert_no_decimal(schema: T.StructType, name: str) -> None:
    def walk(dt: T.DataType) -> bool:
        if isinstance(dt, T.DecimalType):
            return True
        if isinstance(dt, T.ArrayType):
            return walk(dt.elementType)
        if isinstance(dt, T.MapType):
            return walk(dt.keyType) or walk(dt.valueType)
        if isinstance(dt, T.StructType):
            return any(walk(f.dataType) for f in dt.fields)
        return False

    offenders = [f.name for f in schema.fields if walk(f.dataType)]
    assert not offenders, (
        f"{name}: DECIMAL in final output schema {offenders} — the driver's "
        "value hash is representation-sensitive; cast to DOUBLE/BIGINT"
    )


def _assert_driver_hashable(schema: T.StructType, name: str) -> None:
    """The driver's canonicalizer crashes on non-scalar cells
    (CORRECTNESS_r06: `unhashable type: 'list'` for the three array-output
    queries). No registered query may emit ARRAY/MAP/STRUCT/BINARY in its
    FINAL schema — serialize arrays (to_json / concat_ws CSV) or project
    scalar elements. Operator APIs may still return complex types; only the
    driver-facing registered projection is constrained."""
    offenders = [
        f"{f.name}:{f.dataType.simpleString()}" for f in schema.fields
        if isinstance(f.dataType,
                      (T.ArrayType, T.MapType, T.StructType, T.BinaryType))
    ]
    assert not offenders, (
        f"{name}: non-scalar driver-facing output {offenders} — the driver "
        "canonicalizer cannot hash these; to_json()/concat_ws() them"
    )


def _cell(v) -> str:
    """Canonical cell repr: width-insensitive for ints, exact for floats,
    repr for everything else (a Decimal object deliberately differs from
    the equal float — that is the driver's sensitivity)."""
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        return "∅" if math.isnan(v) else f"f:{float(v)!r}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        # driver-observed leniency: DuckDB returns DATE as midnight
        # Timestamp while Spark returns datetime.date — hash them the same
        ts = pd.Timestamp(v)
        if ts.normalize() == ts:
            return f"d:{ts.date().isoformat()}"
        return f"t:{ts.isoformat()}"
    if isinstance(v, datetime.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return f"{type(v).__name__}:{v!r}"


def _canon_rows(df: pd.DataFrame) -> list:
    cols = sorted(df.columns)
    rows = [tuple(_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)



def _assert_plan_hygiene(sdf, name: str) -> None:
    """Repo-wide anti-pattern gate, piggybacked on the parity sweep (every
    registered query passes through here): the physical plan may never
    contain a non-broadcast CartesianProduct (bounded θ-joins must come
    through as broadcast nested-loop joins at this scale) or a
    row-at-a-time Python UDF (BatchEvalPython — all Python must cross via
    Arrow: ArrowEvalPython / mapInPandas / applyInPandas). UDTFs are
    exempt from the Arrow rule (BatchEvalPythonUDTF is Spark's only UDTF
    node unless the arrow-UDTF flag is on)."""
    plan = sdf._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: CartesianProduct\n{plan}"
    scalar_plan = plan.replace("BatchEvalPythonUDTF", "")
    assert "BatchEvalPython" not in scalar_plan, (
        f"{name}: row-at-a-time Python UDF\n{plan}")


QUERIES, ORACLES = Q.all_queries(), Q.all_oracles()
ORACLE_CASES = sorted(ORACLES)
ROWS_ONLY_CASES = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_match(spark, duck, name):
    register_views(duck, SF_CORRECT)
    sdf = QUERIES[name](spark, SF_CORRECT)
    _assert_no_decimal(sdf.schema, name)
    _assert_driver_hashable(sdf.schema, name)
    _assert_plan_hygiene(sdf, name)
    got = sdf.toPandas()
    want = duck.execute(ORACLES[name]).df()
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    g, w = _canon_rows(got), _canon_rows(want)
    mism = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
    assert g == w, (
        f"{name}: value mismatch at sorted rows {mism}: "
        + "; ".join(f"spark={g[i]} oracle={w[i]}" for i in mism)
    )


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, name):
    df = QUERIES[name](spark, SF_CORRECT)
    _assert_no_decimal(df.schema, name)
    _assert_driver_hashable(df.schema, name)
    _assert_plan_hygiene(df, name)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
