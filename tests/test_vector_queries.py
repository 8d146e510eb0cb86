"""Semantic checks for the queries_vector retrieval shapes.

Oracle parity (test_oracle_parity.py) already pins Spark ≡ DuckDB for these;
here we pin the *retrieval semantics* against independent numpy recomputation:
range-search membership is exactly the brute-force radius set, matryoshka's
two-stage result equals the exact single-stage top-k on the clustered
fixture, and MaxSim obeys its lower-bound relation to the full-vector dot.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from parquetaivectorsearch_spark import queries_vector as QV
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb_np():
    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"))
    mat = np.asarray([np.asarray(v) for v in t.column("embedding").to_pylist()],
                     dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def test_range_search_matches_bruteforce(spark, emb_np):
    ids, mat = emb_np
    q = mat[ids == 0][0]
    dist = np.round(1.0 - mat @ q, 6) + 0.0
    expected = set(ids[dist < 0.9].tolist())
    got = QV.q_knn_range_search(spark, SF_SMOKE).toPandas()
    assert set(got["vec_id"]) == expected
    assert (got["distance"] < 0.9).all()
    # the self-match is always inside the radius
    assert 0 in set(got["vec_id"])


def test_matryoshka_matches_two_stage_definition(spark, emb_np):
    """The result must equal the two-stage definition recomputed in numpy —
    coarse top-50 on dims 1-16, exact full-width top-10 within the
    shortlist — and the shortlist must recover most of the true top-10
    (the 16-dim prefix carries only part of the 64-dim cluster signal on
    this fixture, so exact equality with single-stage top-10 is NOT
    guaranteed; recall@10 is)."""
    ids, mat = emb_np
    q = mat[ids == 0][0]
    pre = np.round(1.0 - mat[:, :16] @ q[:16], 6) + 0.0
    order = sorted(zip(pre, ids), key=lambda t: (t[0], t[1]))
    shortlist = [int(i) for _, i in order[:50]]
    sub = np.isin(ids, shortlist)
    full = np.round(1.0 - mat[sub] @ q, 6) + 0.0
    expect10 = [int(i) for _, i in
                sorted(zip(full, ids[sub]), key=lambda t: (t[0], t[1]))[:10]]
    got = QV.q_matryoshka_topk(spark, SF_SMOKE).toPandas()
    assert list(got["vec_id"]) == expect10
    # monotone non-decreasing distances in rank order
    assert (np.diff(got["distance"].to_numpy()) >= 0).all()
    # the adaptive-width shortlist still recovers most of the true top-10
    exact = np.round(1.0 - mat @ q, 6) + 0.0
    exact10 = {int(i) for _, i in
               sorted(zip(exact, ids), key=lambda t: (t[0], t[1]))[:10]}
    assert len(exact10 & set(got["vec_id"])) >= 6


def test_maxsim_lower_bounded_by_full_dot(spark, emb_np):
    """MaxSim(q, d) = Σ_i max_j <q_i, d_j> ≥ Σ_i <q_i, d_i> = <q, d> — the
    diagonal of the interaction grid is the full-vector dot, and each max is
    at least its diagonal entry. The self-query is therefore ranked first."""
    ids, mat = emb_np
    q = mat[ids == 0][0]
    got = QV.q_maxsim_multivector(spark, SF_SMOKE).toPandas()
    assert int(got["vec_id"].iloc[0]) == 0
    id2dot = dict(zip(ids.tolist(), (mat @ q).tolist()))
    for vid, score in zip(got["vec_id"], got["maxsim"]):
        assert score >= round(id2dot[int(vid)], 6) - 1e-9
    # descending score order with vec_id tiebreak
    pairs = list(zip(-got["maxsim"].to_numpy(), got["vec_id"].to_numpy()))
    assert pairs == sorted(pairs)
