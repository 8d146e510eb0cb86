"""Z-order layout: bit-interleave correctness vs a python reference, and the
clustering property of zorder_repartition (per-split Z-ranges are disjoint
and both dimensions' bounding boxes shrink vs the unclustered layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquetaivectorsearch_spark.operators import layout as L
from tests.conftest import SF_CORRECT
from parquetaivectorsearch_spark.sources import load_table


def _py_spread(v: int) -> int:
    for sh, mask in [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]:
        v = (v | (v << sh)) & mask
    return v


def _py_z(x: int, y: int) -> int:
    return _py_spread(x & 0xFFFF) | (_py_spread(y & 0xFFFF) << 1)


def test_zorder_value_matches_reference(spark):
    import pandas as pd

    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255), (65535, 65535), (12345, 54321)]
    pdf = pd.DataFrame(pts, columns=["x", "y"])
    out = (
        spark.createDataFrame(pdf)
        .select("x", "y", L.zorder_value(F.col("x"), F.col("y")).alias("z"))
        .toPandas()
    )
    for _, r in out.iterrows():
        assert r.z == _py_z(int(r.x), int(r.y)), (r.x, r.y, r.z)


def test_zorder_repartition_clusters_both_dimensions(spark):
    o = load_table(spark, SF_CORRECT, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).alias("xb"),
        F.expr("div(CAST(ROUND(o_totalprice * 100) AS BIGINT), 100000)").alias("yb"),
    )
    parts = 8
    clustered = L.zorder_repartition(o, "xb", "yb", parts)
    stats = (
        clustered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.min("z").alias("zmin"), F.max("z").alias("zmax"),
            (F.max("xb") - F.min("xb")).alias("xspan"),
            (F.max("yb") - F.min("yb")).alias("yspan"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert len(stats) == parts
    # Z-ranges of the splits must be disjoint (range partitioning worked).
    spans = sorted((r.zmin, r.zmax) for r in stats)
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0, spans
    # Clustering: the mean per-split bounding-box area must be well under
    # the full-domain box (both dimensions tighten at once — the z-curve
    # property a single-column sort cannot give).
    full = o.agg(
        (F.max("xb") - F.min("xb")).alias("xs"),
        (F.max("yb") - F.min("yb")).alias("ys"),
    ).collect()[0]
    full_area = full.xs * full.ys
    mean_area = sum(r.xspan * r.yspan for r in stats) / len(stats)
    assert mean_area < 0.5 * full_area, (mean_area, full_area)


def test_hilbert_bijection_and_unit_steps(spark):
    """The two defining Hilbert properties on the full 32x32 grid
    (bits=5): codes are a bijection onto 0..1023, and CONSECUTIVE codes
    are grid-adjacent (manhattan distance exactly 1) - the locality
    guarantee Z-order lacks. Also quantifies the Z comparison: total
    manhattan travel along the curve is 1023 for Hilbert vs strictly
    more for Morton order."""
    import pyspark.sql.functions as F

    from parquetaivectorsearch_spark.operators.layout import (
        hilbert_value, zorder_value)

    grid = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x INT, y INT")
    rows = grid.select(
        "x", "y",
        hilbert_value(F.col("x"), F.col("y"), bits=5).alias("h"),
        zorder_value(F.col("x"), F.col("y")).alias("z"),
    ).collect()
    hs = sorted(rows, key=lambda r: r.h)
    assert [r.h for r in hs] == list(range(1024))  # bijection
    steps = [abs(a.x - b.x) + abs(a.y - b.y) for a, b in zip(hs, hs[1:])]
    assert all(s == 1 for s in steps)  # unit-step continuity
    zs = sorted(rows, key=lambda r: r.z)
    z_travel = sum(abs(a.x - b.x) + abs(a.y - b.y)
                   for a, b in zip(zs, zs[1:]))
    assert z_travel > 1023  # Morton jumps; Hilbert never does


def test_hilbert_sql_matches_column_version(spark):
    """The generated DuckDB CTE unroll computes bit-identical Hilbert
    codes to the Catalyst Column version over a random sample of the
    16-bit domain."""
    import duckdb
    import numpy as np
    import pyspark.sql.functions as F

    from parquetaivectorsearch_spark.operators.layout import (
        hilbert_sql_ctes)

    rng = np.random.RandomState(9)
    pts = [(int(i), int(x), int(y)) for i, (x, y) in enumerate(
        zip(rng.randint(0, 65536, 300), rng.randint(0, 65536, 300)))]
    df = spark.createDataFrame(pts, "k INT, x INT, y INT")
    from parquetaivectorsearch_spark.operators.layout import hilbert_index
    got = {r.k: r.hval for r in
           hilbert_index(df, "x", "y", bits=16).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE pts(k INT, x INT, y INT)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?)", pts)
    ctes, final = hilbert_sql_ctes("x", "y", "k", "pts", bits=16)
    want = dict(con.execute(
        f"WITH {ctes}\nSELECT k, hval FROM {final}").fetchall())
    assert got == want


def test_hilbert_boxes_tighter_than_morton(spark):
    """The pruning-power claim, measured on real data: bucket the orders
    table 16 ways along each curve and compare total bounding-box AREA
    (the volume a parquet reader cannot prune). Hilbert's unit-step
    locality must produce a total area no larger than Morton's — on
    this data it is strictly smaller."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from parquetaivectorsearch_spark.operators.layout import (
        hilbert_index, zorder_value)
    from parquetaivectorsearch_spark.sources import load_table
    from tests.conftest import SF_CORRECT

    t = load_table(spark, SF_CORRECT, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).alias("xb"),
        F.expr("div(CAST(ROUND(o_totalprice * 100) AS BIGINT), 100000)")
        .alias("yb"))

    def total_area(bucketed):
        rows = bucketed.groupBy("bucket").agg(
            (F.max("xb") - F.min("xb")).alias("dx"),
            (F.max("yb") - F.min("yb")).alias("dy")).collect()
        return sum((r.dx + 1) * (r.dy + 1) for r in rows)

    h = hilbert_index(t, "xb", "yb", bits=16).withColumn(
        "bucket", F.ntile(16).over(Window.orderBy("hval", "o_orderkey")))
    z = t.withColumn("zval", zorder_value(F.col("xb"), F.col("yb"))) \
        .withColumn("bucket", F.ntile(16).over(
            Window.orderBy("zval", "o_orderkey")))
    a_h, a_z = total_area(h), total_area(z)
    assert a_h < a_z, (a_h, a_z)


def test_ntile_two_phase_matches_window_ntile(spark):
    """The two-phase exact ntile (r14: range partition + P-scalar
    offsets + Spark's NTile sizing arithmetic) must reproduce
    F.ntile(k) OVER (ORDER BY ...) bit-for-bit, including the
    remainder buckets (n % k leading buckets one row larger) and the
    n < k degenerate case."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from parquetaivectorsearch_spark.operators.layout import ntile_two_phase

    import random
    rng = random.Random(11)
    for n, k in ((1000, 16), (37, 16), (5, 16), (48, 7)):
        rows = [(i, rng.randrange(1_000)) for i in range(n)]
        df = spark.createDataFrame(rows, "id BIGINT, v BIGINT")
        want = {r["id"]: r["b"] for r in df.withColumn(
            "b", F.ntile(k).over(Window.orderBy("v", "id"))).collect()}
        got = {r["id"]: r["bucket"] for r in
               ntile_two_phase(df, k, ["v", "id"], parts=4).collect()}
        assert got == want, (n, k)
