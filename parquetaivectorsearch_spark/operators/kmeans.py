"""Distributed Lloyd k-means over a full vector corpus — the DISTRIBUTED
upgrade to the engine's driver-side capped-sample trainers (operators/
ann.py's IVF coarse quantizer and operators/pq.py's codebook trainers
train on a bounded driver sample; this operator runs Lloyd's iteration
over EVERY row, the way a corpus-wide semantic-clustering / SemDeDup-
style bucketing pass must at 100 TB).

Algorithm: standard Lloyd (Lloyd 1982, "Least squares quantization in
PCM"), FIXED round count so the whole computation is oracle-expressible
as unrolled CTEs (the LPA/random-walks/kcore precedent).

Spark shape (the plan you want at 100 TB):
- Seeding is the first k rows by id — deterministic and replayable by
  ``ORDER BY id LIMIT k`` in any engine (a k-means++ scan would add k
  passes and a data-dependent RNG no SQL oracle can replay).
- Each round is ONE narrow pass over the corpus: the k×d centroid matrix
  (tiny, bounded — the IVF-centroid posture) is embedded as a LITERAL
  array-of-arrays, the per-row argmin is a codegen'd fold over that
  literal (array_position of array_min — NO n×k cross-join row
  explosion, NO shuffle for assignment), and the update is one
  groupBy(cid) with d avg aggregates — map-side partial aggregation
  ships k×d partials per task, never rows.
- Driver pulls are exactly k×d doubles per round (the audited bounded-
  pull posture); the prepared corpus is lazily localCheckpointed so
  every round reuses the same materialized scan.
- Centroid coordinates are rounded to 9 decimals each round, in the
  operator AND the oracle: both engines compute IEEE-double averages
  whose partial-sum order differs, so the raw last bits differ;
  rounding far above the 1e-15 drift and far below any real distance
  gap makes the per-round centroids — and therefore every assignment —
  bit-identical across engines and partitionings.

Tie-breaks are total: equal distances resolve to the smallest cid
(array_position returns the FIRST minimal index; centroid literals are
built in ascending-cid order), matching the oracle's ORDER BY dist, cid.
Empty clusters are DROPPED for the following round (k may shrink) — the
same thing a GROUP BY produces in SQL, so the unrolled oracle mirrors it
for free.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_expr(cents: list[tuple[int, list[float]]], vec_col: str):
    """(cid, dist²) columns for the argmin against the centroid literals:
    a codegen'd sum of squared differences per centroid, array_min +
    array_position for the first (= smallest-cid) minimal entry."""
    dists = [
        F.aggregate(
            F.zip_with(F.col(vec_col),
                       F.array(*[F.lit(float(x)) for x in v]),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)
        for _cid, v in cents
    ]
    darr = F.array(*dists)
    pos = F.array_position(darr, F.array_min(darr)).cast("int")
    cid_by_pos = F.array(*[F.lit(int(cid)) for cid, _v in cents])
    return F.element_at(cid_by_pos, pos).alias("cid")


def kmeans_lloyd(corpus: DataFrame, k: int = 8, rounds: int = 3,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 stats: dict | None = None) -> DataFrame:
    """Run ``rounds`` Lloyd iterations; returns the final (id, cid)
    assignment frame. ``stats["centroids"]`` records the final centroid
    dict when a dict is passed (for tests and downstream encode)."""
    e = (corpus.select(F.col(id_col).alias("id"),
                       F.col(vec_col).cast("array<double>").alias("v"))
         .localCheckpoint(eager=False))
    d = len(e.select("v").first()["v"])
    seed_rows = e.orderBy("id").limit(k).collect()
    cents: list[tuple[int, list[float]]] = [
        (i, [float(x) for x in r["v"]]) for i, r in enumerate(seed_rows)]
    for _ in range(rounds):
        assign = e.select("id", "v", _assign_expr(cents, "v"))
        agg = (assign.groupBy("cid")
               .agg(*[F.round(F.avg(F.col("v").getItem(i)), 9)
                      .alias(f"c{i}") for i in range(d)])
               .collect())
        cents = sorted(
            (int(r["cid"]), [float(r[f"c{i}"]) for i in range(d)])
            for r in agg)
    if stats is not None:
        stats["centroids"] = {cid: np.array(v) for cid, v in cents}
    return e.select("id", _assign_expr(cents, "v"))


def kmeans_oracle_sql(k: int, rounds: int, d: int, table_sql: str) -> str:
    """The unrolled DuckDB replay of ``kmeans_lloyd`` over ``table_sql``
    (a SELECT yielding (id, v DOUBLE[])): seed = first k by id, each
    round = ROW_NUMBER argmin over the cross join (ORDER BY dist, cid —
    the operator's smallest-cid tie-break) + per-dimension AVG rounded
    to 9 decimals. Generated next to the operator so the two unrollings
    can never drift apart."""
    sel_dist = (f"list_sum(list_transform(generate_series(1, {d}),"
                f" i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i])))")
    parts = [f"""
    e AS ({table_sql}),
    c0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cid, v
      FROM (SELECT id, v FROM e ORDER BY id LIMIT {k})
    )"""]
    for t in range(1, rounds + 1):
        parts.append(f"""
    a{t} AS (
      SELECT id, cid FROM (
        SELECT e.id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.id
                                  ORDER BY {sel_dist}, c.cid) AS rn
        FROM e CROSS JOIN c{t - 1} c) t WHERE rn = 1
    ),
    c{t} AS (
      SELECT cid, list(val ORDER BY dim) AS v FROM (
        SELECT a.cid, u.i AS dim, ROUND(AVG(e.v[u.i]), 9) AS val
        FROM a{t} a JOIN e USING (id),
             unnest(generate_series(1, {d})) AS u(i)
        GROUP BY a.cid, u.i)
      GROUP BY cid
    )""")
    final = f"""
    SELECT id, cid FROM (
      SELECT e.id, c.cid,
             ROW_NUMBER() OVER (PARTITION BY e.id
                                ORDER BY {sel_dist}, c.cid) AS rn
      FROM e CROSS JOIN c{rounds} c) t WHERE rn = 1
"""
    return "WITH " + ",".join(parts) + final
