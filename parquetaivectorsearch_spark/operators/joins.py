"""Temporal join operators the DataFrame API has no primitive for:
as-of join and bounded range join (SURVEY.md §2.3 "range/as-of joins").

Both are compositions of existing relational operators (option (a) of the
custom-operator ladder) — no UDFs, no mapInPandas — chosen for their
shuffle shape at scale:

- **as-of**: the naive form is a per-left-row "latest right row ≤ ts"
  subquery — quadratic and unplannable. The scalable form is the
  union-and-carry trick: tag both sides, union, one window over
  (key, time) carrying the last right-side payload forward
  (last(..., ignoreNulls)), keep left rows. ONE shuffle on the key, state
  O(1) per row — the same shape a stream-stream as-of would use.
- **range**: the naive θ-join explodes to |A|×|B| before filtering. The
  scalable form buckets time into `width`-sized cells and joins only
  (same bucket, adjacent bucket) pairs — the candidate set is linear in
  the true match count for bounded ranges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _epoch_us(df: DataFrame, ts: str) -> Column:
    """Epoch microseconds for either timestamp flavor: unix_micros needs
    TIMESTAMP (instant); NTZ values diff against an NTZ epoch base."""
    if isinstance(df.schema[ts].dataType, T.TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts})"
        )
    return F.unix_micros(F.col(ts))


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              payload: list[str], tolerance: Column | None = None) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.ts <= left.ts, per `on` key. `payload` names right-side columns to
    carry (returned as asof_<name>); ties at equal ts resolve to the right
    row (right sorts before left at the same instant), then by right row
    order of appearance.

    Plan: union → window(partitionBy(on), orderBy(ts, side)) →
    last(ignoreNulls) → filter left side. One hash shuffle on `on`.
    """
    lcols = left.columns
    l = left.select(*lcols).withColumn("_side", F.lit(1))
    for p in payload:
        l = l.withColumn(f"_p_{p}", F.lit(None).cast(right.schema[p].dataType))
    r = right.select(
        F.col(on), F.col(ts), F.lit(0).alias("_side"),
        *[F.col(p).alias(f"_p_{p}") for p in payload],
    )
    for c in lcols:
        if c not in (on, ts):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.select(*lcols, "_side", *[f"_p_{p}" for p in payload]).unionByName(
        r.select(*lcols, "_side", *[f"_p_{p}" for p in payload])
    )
    # Pin the window's parallelism: the union is a few bytes per row, so
    # AQE's byte-based coalescing would run the sort+carry — the CPU-heavy
    # step — on one or two cores. An explicit numbered repartition on the
    # window key satisfies the window's required distribution (no second
    # exchange) and is exempt from AQE coalescing.
    u = u.repartition(u.sparkSession.sparkContext.defaultParallelism, on)
    # Total order inside each key: (ts, side) — callers must pre-dedupe the
    # right side to one row per (on, ts), which makes the carry fully
    # deterministic (right rows sort before left rows at the same instant).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *lcols, "_side",
        *[F.last(f"_p_{p}", ignorenulls=True).over(w).alias(f"asof_{p}") for p in payload],
        *( [F.last(F.when(F.col("_side") == 0, F.col(ts)).otherwise(None),
                   ignorenulls=True).over(w).alias("_asof_ts")]
           if tolerance is not None else [] ),
    )
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if tolerance is not None:
        keep = F.col("_asof_ts").isNotNull() & (F.col(ts) - F.col("_asof_ts") <= tolerance)
        out = out.select(
            *lcols,
            *[F.when(keep, F.col(f"asof_{p}")).alias(f"asof_{p}") for p in payload],
        )
    return out


def range_join_bucketed(events: DataFrame, key: str, ts: str,
                        max_gap_seconds: int, payload: list[str]) -> DataFrame:
    """Self range-join: pairs (a, b) with same key, a.ts < b.ts, and
    b.ts - a.ts <= max_gap seconds.

    Bucketing: cell = floor(epoch/gap); b lives in a's cell or the next one,
    so the join key is (key, cell) with a's rows emitted into both cells —
    candidates are O(true pairs), then the exact predicate filters.
    Output columns: key, a_<payload>, b_<payload>, gap_seconds.
    """
    us = _epoch_us(events, ts)
    base = events.select(
        F.col(key), us.alias("_us"),
        ((us / F.lit(1_000_000)).cast("bigint") / F.lit(max_gap_seconds))
        .cast("bigint").alias("_cell"),
        *[F.col(p) for p in payload],
    )
    a = base.select(
        F.col(key), F.col("_cell"),
        F.col("_us").alias("_us_a"), *[F.col(p).alias(f"a_{p}") for p in payload],
    )
    # a participates in its own cell and the next (b may be one cell ahead)
    a2 = a.withColumn("_cell", F.explode(F.array(F.col("_cell"), F.col("_cell") + 1)))
    b = base.select(
        F.col(key), F.col("_cell"),
        F.col("_us").alias("_us_b"), *[F.col(p).alias(f"b_{p}") for p in payload],
    )
    # Pin join parallelism (see asof_join): the shuffled rows are a few
    # bytes each but the joined candidate set is where the compute lives,
    # so AQE's byte-based coalescing would serialize it.
    target = events.sparkSession.sparkContext.defaultParallelism
    a2 = a2.repartition(target, F.col(key), F.col("_cell"))
    b = b.repartition(target, F.col(key), F.col("_cell"))
    gap = (F.col("_us_b") - F.col("_us_a")) / F.lit(1_000_000.0)
    return (
        a2.join(b, [key, "_cell"])
        .filter((F.col("_us_a") < F.col("_us_b"))
                & (gap <= F.lit(float(max_gap_seconds))))
        .select(F.col(key), *[f"a_{p}" for p in payload],
                *[f"b_{p}" for p in payload], gap.alias("gap_seconds"))
        # no distinct needed: a qualifying pair meets in exactly one of a's
        # two cells (b's own cell), so candidates are already unique
    )
