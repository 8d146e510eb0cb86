"""Direct semantics for the temporal join operators (the oracle-parity
cases cover the happy path; these pin edges: tolerance expiry, no-match
nulls, range boundary inclusion/exclusion)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from parquetaivectorsearch_spark.operators import joins as J

_T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes):
    return _T0 + dt.timedelta(minutes=minutes)


def test_asof_join_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(30), 101), (2, _ts(5), 102)],
        "user_id BIGINT, ts TIMESTAMP_NTZ, event_id BIGINT",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 7.0), (1, _ts(20), 8.0), (2, _ts(6), 9.0)],
        "user_id BIGINT, ts TIMESTAMP_NTZ, v DOUBLE",
    )
    out = {r.event_id: r.asof_v
           for r in J.asof_join(left, right, "user_id", "ts", ["v"]).collect()}
    # user 1: event@10 sees click@0; event@30 sees click@20
    assert out[100] == 7.0 and out[101] == 8.0
    # user 2: right row is AFTER the left row → no match, null
    assert out[102] is None


def test_asof_join_same_instant_matches(spark):
    """A right row at exactly left.ts is visible (<=, right sorts first)."""
    left = spark.createDataFrame(
        [(1, _ts(10), 100)], "user_id BIGINT, ts TIMESTAMP_NTZ, event_id BIGINT")
    right = spark.createDataFrame(
        [(1, _ts(10), 5.0)], "user_id BIGINT, ts TIMESTAMP_NTZ, v DOUBLE")
    row = J.asof_join(left, right, "user_id", "ts", ["v"]).collect()[0]
    assert row.asof_v == 5.0


def test_asof_join_tolerance_expires(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(120), 101)],
        "user_id BIGINT, ts TIMESTAMP_NTZ, event_id BIGINT",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 7.0)], "user_id BIGINT, ts TIMESTAMP_NTZ, v DOUBLE")
    out = {r.event_id: r.asof_v for r in J.asof_join(
        left, right, "user_id", "ts", ["v"],
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    ).collect()}
    assert out[100] == 7.0      # 10 min old: inside tolerance
    assert out[101] is None     # 120 min old: expired


def test_range_join_boundaries(spark):
    e = spark.createDataFrame(
        [(1, _ts(0), 10), (1, _ts(5), 11), (1, _ts(10), 12), (2, _ts(0), 13)],
        "user_id BIGINT, ts TIMESTAMP_NTZ, event_id BIGINT",
    )
    out = {(r.a_event_id, r.b_event_id, r.gap_seconds)
           for r in J.range_join_bucketed(e, "user_id", "ts", 300,
                                          ["event_id"]).collect()}
    # 5-min gap inclusive; 10-min excluded; a.ts < b.ts strict; users isolated
    assert out == {(10, 11, 300.0), (11, 12, 300.0)}
