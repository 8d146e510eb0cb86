"""Skew-mitigation operators: salted join, bucketed co-located join.

AQE's skew-join splitting (on in session.py) handles most runtime skew;
these are the explicit forms for when the skew is known ahead of time:

- **salted join**: replicate the build side over `n_salts` salt values and
  scatter the probe side by a deterministic per-row salt — a hot key's
  rows spread over n_salts reducers instead of one straggler. Result is
  identical to the plain join (oracle-checked as `join_salted`).
- **bucketed tables**: pre-shuffle both sides into the same bucket layout
  (`bucketBy` on the join key) so the join itself needs NO exchange — the
  100 TB answer for repeatedly-joined fact tables. Asserted shuffle-free
  in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with salting: probe rows get salt = xxhash64(all probe
    columns) mod n (deterministic, no rand()); build rows are replicated
    across all n salts. Join key becomes (key, salt).

    Cost model: build side inflates n_salts×, probe side spreads hot keys
    over n_salts tasks — the right trade when build ≪ probe and probe keys
    are skewed. Output columns = probe ∪ (build − key).

    Only probe-preserving join types are valid: the build side is
    replicated n_salts×, so right/full outer would emit n_salts duplicates
    of every unmatched build row.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is incorrect under build-side "
            f"replication (unmatched build rows would duplicate n_salts×); "
            f"use one of {sorted(allowed)}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    p = probe.withColumn("_salt", salt.cast("int"))
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return p.join(b, [key, "_salt"], how).drop("_salt")


def write_bucketed(df: DataFrame, table_name: str, key: str, n_buckets: int,
                   sort_by: str | None = None) -> None:
    """Persist as a bucketed table (saveAsTable — bucket metadata lives in
    the catalog; plain parquet paths can't carry it). Both sides of a
    repeated join bucketed identically ⇒ the join plans with zero
    Exchange."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.format("parquet").saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two identically-bucketed catalog tables — shuffle-free."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
