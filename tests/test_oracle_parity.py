"""Strict Spark ↔ DuckDB oracle parity for every registered query.

This replicates (conservatively) the driver's t2 gate: row count, column
names, and order-insensitive *exact* value equality. If this passes with
``assert_frame_equal(check_exact=True)``, any sane value-hash matches too.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pandas.testing import assert_frame_equal

from parquetaivectorsearch_spark import queries as Q
from tests.conftest import SF_CORRECT, register_views


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


QUERIES, ORACLES = Q.all_queries(), Q.all_oracles()
ORACLE_CASES = sorted(ORACLES)
ROWS_ONLY_CASES = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_match(spark, duck, name):
    register_views(duck, SF_CORRECT)
    got = QUERIES[name](spark, SF_CORRECT).toPandas()
    want = duck.execute(ORACLES[name]).df()
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    g, w = _canon(got), _canon(want)
    # dtypes may differ in width (int32 vs int64) across engines; compare
    # values exactly after aligning dtypes to the widest common kind.
    for c in g.columns:
        if g[c].dtype != w[c].dtype:
            g[c] = g[c].astype(w[c].dtype)
    assert_frame_equal(g, w, check_exact=True, check_dtype=False)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, name):
    df = QUERIES[name](spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
