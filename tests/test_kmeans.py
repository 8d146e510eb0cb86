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
