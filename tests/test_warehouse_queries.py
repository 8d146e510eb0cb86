"""Semantic checks for the warehouse-ingestion operators (oracle parity is
covered in test_oracle_parity.py; hll_distinct is rows-only so its accuracy
contract lives here)."""

from __future__ import annotations

from parquetaivectorsearch_spark import queries as Q
from tests.conftest import SF_CORRECT

QUERIES = Q.all_queries()


def test_hll_estimate_within_tolerance(spark):
    """DataSketches HLL at default lgK=12 carries ~1.6% relative standard
    error; doc_id is unique so exact_total == corpus size. Assert the
    estimate lands within 5% (≈3σ)."""
    row = QUERIES["hll_distinct"](spark, SF_CORRECT).collect()[0]
    est, exact = row["est_total"], row["exact_total"]
    assert exact > 0
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_scd2_intervals_are_contiguous(spark):
    """Per user: intervals ordered by valid_from chain exactly (each
    valid_to equals the next valid_from) and only the last is open."""
    rows = QUERIES["scd2_intervals"](spark, SF_CORRECT).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from_us"])
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev["valid_to_us"] == nxt["valid_from_us"], user
        assert ivs[-1]["valid_to_us"] is None
        assert all(iv["valid_to_us"] is not None for iv in ivs[:-1])


def test_latest_by_key_matches_max_ts(spark):
    """Every key's reported last_ts is the true max event ts for that key."""
    from pyspark.sql import functions as F

    from parquetaivectorsearch_spark.sources import load_table

    got = {
        r["user_id"]: r["last_ts_us"]
        for r in QUERIES["latest_by_key"](spark, SF_CORRECT).collect()
    }
    want = {
        r["user_id"]: r["m"]
        for r in load_table(spark, SF_CORRECT, "events")
        .groupBy("user_id")
        .agg(F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', max(ts))"
        ).alias("m"))
        .collect()
    }
    assert got == want


def test_seasonal_decompose_additive_identity(spark):
    """Decomposition must reassemble: trend + seasonal + remainder equals
    the daily total (to fp round-off), trend is only defined where the
    full 7-day window exists (30 days -> 24 rows), and the weekly
    seasonal slots average to ~0 (the detrended series' mean is split
    between seasonal and remainder by construction)."""
    from parquetaivectorsearch_spark.queries_warehouse import (
        q_seasonal_decompose)
    from tests.conftest import SF_CORRECT

    rows = q_seasonal_decompose(spark, SF_CORRECT).collect()
    assert len(rows) == 24
    for r in rows:
        assert abs((r.trend + r.seasonal + r.remainder)
                   - r.total_cents) < 1e-6, r
    slots = {}
    for r in rows:
        slots.setdefault(r.dow, r.seasonal)
    assert len(slots) == 7
    mean_season = sum(slots.values()) / 7
    spread = max(slots.values()) - min(slots.values())
    assert abs(mean_season) < max(1.0, 0.5 * spread)
