"""Distributed Lloyd k-means semantics: planted-blob recovery,
partitioning-invariance of the assignments (the IEEE-drift claim the
9-decimal centroid rounding makes), and the empty-cluster drop path.
Oracle parity of the registered `kmeans_clusters` query rides the
standard parity suite."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from parquetaivectorsearch_spark.operators.kmeans import kmeans_lloyd


def _blob_frame(spark, n_per=40, d=8, seed=3):
    """Three well-separated Gaussian blobs; ids interleave blobs so the
    first-k-by-id seeding picks one point from each blob."""
    rng = np.random.RandomState(seed)
    centers = np.array([[10.0] * d, [-10.0] * d,
                        [10.0] * (d // 2) + [-10.0] * (d - d // 2)])
    rows = []
    for i in range(n_per):
        for b in range(3):
            v = centers[b] + rng.randn(d) * 0.5
            rows.append((i * 3 + b, b, [float(x) for x in v]))
    pdf = pd.DataFrame(rows, columns=["vec_id", "blob", "embedding"])
    return spark.createDataFrame(
        pdf, "vec_id long, blob long, embedding array<double>")


def test_kmeans_recovers_planted_blobs(spark):
    docs = _blob_frame(spark)
    got = kmeans_lloyd(docs, k=3, rounds=3).toPandas()
    truth = docs.select("vec_id", "blob").toPandas()
    m = got.merge(truth, left_on="id", right_on="vec_id")
    # each cid maps to exactly one blob and covers it entirely
    tab = m.groupby(["cid", "blob"]).size().unstack(fill_value=0)
    assert (tab.gt(0).sum(axis=1) == 1).all(), tab
    assert tab.to_numpy().sum() == len(truth)


def test_kmeans_assignments_are_partitioning_invariant(spark):
    docs = _blob_frame(spark, seed=11)
    a = {(r.id, r.cid) for r in
         kmeans_lloyd(docs.repartition(13), k=3, rounds=3).collect()}
    b = {(r.id, r.cid) for r in
         kmeans_lloyd(docs.repartition(2, "vec_id")
                      .sortWithinPartitions(F.desc("vec_id")),
                      k=3, rounds=3).collect()}
    assert a == b


def test_kmeans_drops_empty_clusters(spark):
    """All-identical points with k=3: every point assigns to cid 0 (the
    smallest-cid tie-break), clusters 1 and 2 go empty after round 1
    and are DROPPED — the documented k-shrink semantics the SQL GROUP
    BY mirrors for free."""
    pdf = pd.DataFrame({"vec_id": range(10),
                        "embedding": [[1.0, 2.0]] * 10})
    docs = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    stats: dict = {}
    got = kmeans_lloyd(docs, k=3, rounds=2, stats=stats).collect()
    assert {r.cid for r in got} == {0}
    assert len(got) == 10
    assert set(stats["centroids"]) == {0}


def test_kmeans_tier_parity_assignments_and_centroids(spark):
    """VERDICT r12 #2: the arrow (broadcast-matmul mapInPandas) tier must
    produce IDENTICAL assignments and identical 9dp-rounded centroids to
    the literal (codegen fold) tier at small k·d — the two compute the
    same Σ(a−b)² up to ~1e-12 relative, far below the fixture blobs'
    distance gaps, and share the Spark-side HALF_UP rounding."""
    docs = _blob_frame(spark, seed=7)
    sa: dict = {}
    sb: dict = {}
    lit = {(r.id, r.cid) for r in
           kmeans_lloyd(docs, k=3, rounds=3, stats=sa,
                        assign_tier="literal").collect()}
    arw = {(r.id, r.cid) for r in
           kmeans_lloyd(docs, k=3, rounds=3, stats=sb,
                        assign_tier="arrow").collect()}
    assert sa["assign_tier"] == "literal" and sb["assign_tier"] == "arrow"
    assert lit == arw
    assert set(sa["centroids"]) == set(sb["centroids"])
    for cid in sa["centroids"]:
        assert np.array_equal(sa["centroids"][cid], sb["centroids"][cid])


def test_kmeans_auto_tier_thresholds_on_kd(spark):
    """auto keeps only genuinely tiny models (k·d ≤ 256 since r14 —
    the bench A/B showed arrow 3× faster already at k·d = 512,
    BENCH_NOTES r14) on the zero-Python literal tier and routes
    everything else to arrow; the arrow run must still assign every row
    to a live centroid."""
    docs = _blob_frame(spark, seed=5)  # k·d = 3×8 = 24 → literal
    st: dict = {}
    kmeans_lloyd(docs, k=3, rounds=1, stats=st)
    assert st["assign_tier"] == "literal"

    # the r13→r14 flip case: the 8×64 headline fixture shape now rides
    # arrow (k·d = 512 > 256)
    docs64 = _blob_frame(spark, seed=5, d=64)
    st512: dict = {}
    kmeans_lloyd(docs64, k=8, rounds=1, stats=st512)
    assert st512["assign_tier"] == "arrow"

    rng = np.random.RandomState(0)
    d, n, k = 48, 300, 90  # k·d = 4320 → arrow
    pdf = pd.DataFrame({
        "vec_id": range(n),
        "embedding": [[float(x) for x in rng.randn(d)] for _ in range(n)]})
    wide = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    st2: dict = {}
    got = kmeans_lloyd(wide, k=k, rounds=2, stats=st2).toPandas()
    assert st2["assign_tier"] == "arrow"
    assert len(got) == n and got["id"].nunique() == n
    assert set(got["cid"]).issubset(set(st2["centroids"]))


def test_kmeans_empty_corpus_raises(spark):
    """ADVICE r12: an empty corpus (or NULL first vector) must raise a
    clear ValueError, not an opaque 'None is not subscriptable' from the
    dimensionality probe — mirroring exact_order_statistic's input
    validation."""
    import pytest

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty corpus"):
        kmeans_lloyd(empty, k=3, rounds=1)
    nulls = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0], "embedding": [None]}),
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="NULL first vector"):
        kmeans_lloyd(nulls, k=3, rounds=1)


def test_kmeans_round_plan_partial_agg_and_flat_lineage(spark):
    """VERDICT r12 #7 plan pin: (a) the literal tier's per-round update
    aggregates map-side BEFORE its one Exchange (k×d partials per task,
    never rows); (b) lineage stays O(1) in rounds — the final assignment
    is a select over the localCheckpointed scan, NOT a stack of
    per-round aggregates, so its plan is round-count-invariant."""
    from parquetaivectorsearch_spark.operators.kmeans import _assign_expr
    from parquetaivectorsearch_spark.plans import inspect as P

    docs = _blob_frame(spark, seed=3)
    e = (docs.select(F.col("vec_id").alias("id"),
                     F.col("embedding").cast("array<double>").alias("v"))
         .localCheckpoint(eager=False))
    cents = [(i, [float(x) for x in r["v"]])
             for i, r in enumerate(e.orderBy("id").limit(3).collect())]
    rnd = (e.select("id", "v", _assign_expr(cents, "v"))
           .groupBy("cid")
           .agg(*[F.round(F.avg(F.col("v").getItem(i)), 9).alias(f"c{i}")
                  for i in range(8)]))
    assert P.has_partial_aggregate(rnd)
    plan = rnd._jdf.queryExecution().executedPlan().toString()
    assert plan.replace("BroadcastExchange", "").count("Exchange") == 1, plan

    p1 = kmeans_lloyd(docs, k=3, rounds=1)._jdf.queryExecution() \
        .analyzed().toString()
    p3 = kmeans_lloyd(docs, k=3, rounds=3)._jdf.queryExecution() \
        .analyzed().toString()
    assert "Aggregate" not in p1 and "Aggregate" not in p3
    assert len(p1.splitlines()) == len(p3.splitlines())


def _trap_frame(spark, n_per=40, d=8, seed=9):
    """The classic Lloyd trap: one far blob F holding ALL the low ids
    (ingest order correlating with content — the realistic failure) and
    a close pair B1/B2 far away. First-k-by-id seeds land entirely in F:
    round 1 sends every B1∪B2 point to one seed, whose update lands
    between B1 and B2 — a stable local optimum (B1,B2 merged, F split)
    that Lloyd can never escape. k-means|| samples ∝ d²(x, C), so B1/B2
    get seeds and the planted structure is recovered."""
    rng = np.random.RandomState(seed)
    centers = {"F": np.zeros(d), "B1": np.full(d, 40.0),
               "B2": np.full(d, 44.0)}
    rows = []
    nid = 0
    for name in ("F", "B1", "B2"):  # F gets ids 0..n_per-1
        for _ in range(n_per):
            v = centers[name] + rng.randn(d) * 0.5
            rows.append((nid, name, [float(x) for x in v]))
            nid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "blob", "embedding"])
    return spark.createDataFrame(
        pdf, "vec_id long, blob string, embedding array<double>")


def test_kmeans_parallel_seed_escapes_first_k_trap(spark):
    """k-means|| (Bahmani et al. 2012) must recover the planted structure
    where the default first-k-by-id seeding provably cannot: on the trap
    fixture the default converges with B1∪B2 merged under one centroid
    (pinned — it IS the motivation), while kmeans_parallel_seed + the
    same Lloyd rounds produce a perfect blob↔cid bijection."""
    from parquetaivectorsearch_spark.operators.kmeans import (
        kmeans_parallel_seed)

    docs = _trap_frame(spark)
    truth = docs.select("vec_id", "blob").toPandas()

    def purity(assign_pdf):
        m = assign_pdf.merge(truth, left_on="id", right_on="vec_id")
        tab = m.groupby(["cid", "blob"]).size().unstack(fill_value=0)
        return tab

    # default seeding: B1 and B2 share a centroid (the trap)
    tab0 = purity(kmeans_lloyd(docs, k=3, rounds=4).toPandas())
    b1_cid = tab0["B1"].idxmax()
    assert tab0.loc[b1_cid, "B2"] > 0, tab0  # merged pair — the trap

    # k-means|| seeding: perfect recovery under the same Lloyd budget
    seeds = kmeans_parallel_seed(docs, k=3)
    tab1 = purity(kmeans_lloyd(docs, k=3, rounds=4, init=seeds).toPandas())
    assert (tab1.gt(0).sum(axis=1) == 1).all(), tab1
    assert tab1.to_numpy().sum() == len(truth)
    assert (tab1.gt(0).sum(axis=0) == 1).all(), tab1  # one cid per blob


def test_kmeans_parallel_seed_is_deterministic_and_bounded(spark):
    """Two runs give byte-identical seeds (hash-uniform Bernoulli + fixed
    driver RNG — the engine's determinism contract), candidates stay
    driver-bounded (≤ 1 + seed_rounds·4l), and partitioning doesn't
    change the result."""
    from parquetaivectorsearch_spark.operators.kmeans import (
        kmeans_parallel_seed)

    docs = _trap_frame(spark, seed=21)
    st1: dict = {}
    st2: dict = {}
    s1 = kmeans_parallel_seed(docs, k=3, stats=st1)
    s2 = kmeans_parallel_seed(docs.repartition(7), k=3, stats=st2)
    assert s1 == s2
    assert st1["candidate_ids"] == st2["candidate_ids"]
    l = 2 * 3
    assert st1["n_candidates"] <= 1 + 5 * 4 * l

    import pytest
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty corpus"):
        kmeans_parallel_seed(empty, k=3)


def test_seeded_lloyd_half_matches_frozen_seed_oracle(spark):
    """VERDICT r13 #2: the composed kmeans‖→Lloyd path's Lloyd HALF is
    hash-gated — the seeding itself is rows-only (driver-RNG weighted
    kmeans++ reduction), but GIVEN the seeds it produced, the remaining
    Lloyd rounds are fully SQL-expressible, so this test freezes the
    seeds into kmeans_oracle_sql(seeds=...) VALUES literals and checks
    every final assignment against the DuckDB replay. This is the
    correctness evidence behind the rows-only kmeans_seeded_clusters
    registry entry."""
    import duckdb

    from parquetaivectorsearch_spark.operators.kmeans import (
        kmeans_oracle_sql, kmeans_parallel_seed)

    docs = _trap_frame(spark, seed=33)
    seeds = kmeans_parallel_seed(docs, k=3, seed_rounds=3)
    got = {(r.id, r.cid) for r in
           kmeans_lloyd(docs, k=3, rounds=2, init=seeds).collect()}

    src = docs.select("vec_id", "embedding").toPandas()
    con = duckdb.connect()
    con.register("src", src)
    sql = kmeans_oracle_sql(
        3, 2, 8, "SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM src",
        seeds=seeds)
    want = {(int(i), int(c)) for i, c in con.execute(sql).fetchall()}
    assert got == want


def test_centroid_rounding_boundary_cross_engine_pin(spark):
    """VERDICT r13 #8: the documented cross-engine round() caveat
    (operators/kmeans.py module docstring) turned into pinned behavior.
    Construct cluster averages that land ON a 5e-10 decimal rounding
    boundary (avg of {0, 3e-9} = 1.5e-9, and of {0, 1e-9} = 5e-10 —
    both within one ulp of the half-way point at scale 9, where Spark's
    BigDecimal-HALF_UP-on-the-exact-double and DuckDB's double-multiply
    ROUND() could in principle disagree) and assert the two engines
    round the SAME way. If an engine upgrade ever flips one side, this
    test localizes the break to the documented caveat instead of a
    mystery oracle mismatch in the kmeans family."""
    import duckdb
    import pandas as pd

    # one cluster (k=1): centroid after round 1 = elementwise avg
    vals = [[0.0, 0.0], [3e-9, 1e-9]]
    pdf = pd.DataFrame({"vec_id": [0, 1], "embedding": vals})
    docs = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    for tier in ("literal", "arrow"):
        st: dict = {}
        kmeans_lloyd(docs, k=1, rounds=1, stats=st,
                     assign_tier=tier).collect()
        got = [float(x) for x in st["centroids"][0]]
        con = duckdb.connect()
        con.register("src", pdf)
        want = con.execute(
            "SELECT ROUND(AVG(embedding[1]), 9), ROUND(AVG(embedding[2]), 9)"
            " FROM src").fetchone()
        assert got == [float(want[0]), float(want[1])], (tier, got, want)
        # Document the direction, with the measured mechanism: the exact
        # double avg(0, 3e-9) is 1.49999999999999999002…e-9 — one ulp
        # BELOW the decimal half-way point — yet BOTH engines round UP
        # to 2e-9. Spark because its round() goes through the SHORTEST
        # DECIMAL REPRESENTATION (scala BigDecimal(double) =
        # java BigDecimal.valueOf = Double.toString → "1.5E-9" → HALF_UP
        # up), not the exact binary value; DuckDB because its
        # double-multiply 1.4999…e-9 · 1e9 lands ≥ 1.5. avg(0, 1e-9) =
        # 5.00000000000000031…e-10 is above the half-way point and both
        # engines agree upward trivially. The shortest-repr semantics is
        # WHY no fixture has ever produced a divergence: any average
        # whose shortest repr reads as the clean half-way decimal rounds
        # up on both sides.
        assert got == [2e-9, 1e-9], (tier, got)
