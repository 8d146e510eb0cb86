"""Semantic + plan checks for the training-pair mining operators
(queries_mining.py). Oracle parity is covered by test_oracle_parity.py;
here we assert the *meaning* (negatives really cross labels, the snapshot
diff partitions the corpus exactly, the ladder nests) and the scale
posture visible in the plan (anchors broadcast, the diff join ships
hashes not text), plus the word-count edge case the fixtures can't reach
(2-word docs drive skipgram's shifted slices to length 0)."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from parquetaivectorsearch_spark import plans as P
from parquetaivectorsearch_spark import queries as Q
from tests.conftest import SF_CORRECT

QUERIES = Q.all_queries()


def _docs(spark):
    return spark.read.parquet(f"{SF_CORRECT}/documents.parquet")


def _embs(spark):
    return spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")


def test_hard_negatives_cross_labels_and_rank(spark):
    rows = QUERIES["hard_negative_mining"](spark, SF_CORRECT).collect()
    labels = dict(_embs(spark).select("vec_id", "label").collect())
    by_anchor = collections.defaultdict(list)
    for r in rows:
        assert r["neg_label"] != r["anchor_label"], r
        assert labels[r["vec_id"]] == r["neg_label"], r
        by_anchor[r["anchor_id"]].append(r)
    assert len(by_anchor) == 8
    for anchor, rs in by_anchor.items():
        rs.sort(key=lambda r: r["neg_rank"])
        assert [r["neg_rank"] for r in rs] == [1, 2, 3, 4, 5]
        dists = [r["distance"] for r in rs]
        assert dists == sorted(dists), (anchor, dists)


def test_hard_negatives_broadcast_anchors(spark):
    df = QUERIES["hard_negative_mining"](spark, SF_CORRECT)
    assert P.has_broadcast_join(df), "anchor batch must broadcast"


def test_triplets_margin_and_roles(spark):
    rows = QUERIES["triplet_mining"](spark, SF_CORRECT).collect()
    labels = dict(_embs(spark).select("vec_id", "label").collect())
    assert len(rows) == 8
    for r in rows:
        assert labels[r["pos_id"]] == r["anchor_label"], r
        assert labels[r["neg_id"]] != r["anchor_label"], r
        assert r["pos_id"] != r["anchor_id"]
        assert abs(r["margin"] - round(r["neg_distance"] - r["pos_distance"], 6)) < 1e-9


def test_skipgram_handles_two_word_docs(spark, tmp_path):
    """n=2 drives the skip-2 slices to length 0; arrays_zip of two empty
    slices must contribute nothing (not error, not a null pair)."""
    d = str(tmp_path / "mini")
    spark.createDataFrame(
        [(1, "alpha beta", "en", "s", 10), (2, "alpha beta gamma", "en", "s", 16)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    rows = {(r["center"], r["context"]): r["n_pairs"]
            for r in QUERIES["skipgram_pairs"](spark, d).collect()}
    # doc1: (a,b); doc2: (a,b),(b,g),(a,g) — symmetrized doubles each
    assert rows[("alpha", "beta")] == 2
    assert rows[("beta", "alpha")] == 2
    assert rows[("alpha", "gamma")] == 1
    assert rows[("gamma", "beta")] == 1
    assert sum(rows.values()) == 8


def test_snapshot_diff_partitions_corpus_exactly(spark):
    rows = {r["status"]: r for r in
            QUERIES["snapshot_diff"](spark, SF_CORRECT).collect()}
    d = _docs(spark)
    n = d.count()
    added = d.where(F.col("doc_id") % 29 == 7).count()
    removed = d.where(F.col("doc_id") % 23 == 5).count()
    changed = d.where((F.col("doc_id") % 23 != 5)
                      & (F.col("doc_id") % 17 == 3)).count()
    assert rows["added"]["n_docs"] == added
    assert rows["removed"]["n_docs"] == removed
    assert rows["changed"]["n_docs"] == changed
    assert rows["unchanged"]["n_docs"] == n - removed - changed
    assert rows["added"]["min_doc"] >= 10000000  # re-ingested id space


def test_snapshot_diff_join_ships_hashes_not_text(spark):
    """The scale claim: (doc_id, md5) is projected BEFORE the full-outer
    join's exchanges — document text never crosses a shuffle boundary."""
    import re

    plan = P.formatted_plan(QUERIES["snapshot_diff"](spark, SF_CORRECT))
    lines = plan.splitlines()
    exchange_inputs = [
        lines[i + 1]
        for i, line in enumerate(lines)
        if re.match(r"\(\d+\) Exchange", line.strip()) and i + 1 < len(lines)
    ]
    assert exchange_inputs
    for inp in exchange_inputs:
        assert "text#" not in inp, f"text crosses an exchange: {inp}"


def test_code_detect_routes_exactly_the_rendered_docs(spark):
    rows = QUERIES["code_detect"](spark, SF_CORRECT).collect()
    expect = {r["source"]: r["n"] for r in
              _docs(spark).where(F.col("doc_id") % 5 == 0)
              .groupBy("source").agg(F.count("*").alias("n")).collect()}
    got = {r["source"]: r["code_docs"] for r in rows}
    for src, n in got.items():
        assert n == expect.get(src, 0), (src, n, expect.get(src, 0))
    for r in rows:
        assert 0.0 <= r["code_line_frac"] <= 1.0
    # the fixture must exercise both routes or the detector is vacuous
    assert any(n > 0 for n in got.values()) and any(n == 0 for n in got.values())


def test_quality_calibrate_rank_bounds_per_source(spark):
    rows = QUERIES["quality_calibrate"](spark, SF_CORRECT).collect()
    by_src = collections.defaultdict(list)
    for r in rows:
        assert 0.0 <= r["pct_rank"] <= 1.0
        by_src[r["source"]].append(r["pct_rank"])
    for src, pr in by_src.items():
        assert min(pr) == 0.0 and max(pr) == 1.0, src


def test_sample_ladder_nests(spark):
    rows = {r["tier"]: r for r in
            QUERIES["sample_ladder"](spark, SF_CORRECT).collect()}
    assert (rows["p0_1"]["n_docs"] <= rows["p1"]["n_docs"]
            <= rows["p10"]["n_docs"] <= rows["p100"]["n_docs"])
    d = _docs(spark)
    total = d.agg(F.count("*"), F.sum("n_chars")).first()
    assert rows["p100"]["n_docs"] == total[0]
    assert rows["p100"]["total_chars"] == total[1]
    # the 10% rung should be a real subsample, not degenerate
    assert 0 < rows["p10"]["n_docs"] < total[0]


def test_negative_samples_partition_of_unity_and_determinism(spark):
    """Every probe must land in EXACTLY one vocab interval (the integer
    cumulative masses partition [0, total)), so the output is exactly
    20 pairs x 5 negatives; two invocations draw identical negatives
    (hash-deterministic, no rng state)."""
    from parquetaivectorsearch_spark.queries import all_queries

    q = all_queries()["negative_samples"]
    a = {(r.center, r.context, r.neg_rank): (r.negative, r.is_collision)
         for r in q(spark, SF_CORRECT).collect()}
    assert len(a) == 100, len(a)
    b = {(r.center, r.context, r.neg_rank): (r.negative, r.is_collision)
         for r in q(spark, SF_CORRECT).collect()}
    assert a == b
    assert all(c in (0, 1) for _, c in a.values())
