"""Partitioned HNSW — the reference's actual index algorithm, Spark-shaped.

The reference builds a Hierarchical Navigable Small World graph over the
corpus (build Program.cs:125-204 via the external HNSW.Net library; M=10,
LevelLambda=1/ln(M), batch add Program.cs:16,170,188), persists topology
only (SerializeGraph Program.cs:231-244), re-binds vectors at load
(Program.cs:246-263), and answers k-NN by graph beam search with
dot-product distance (Program.cs:207-227). Its own Option 1
(Program.cs:140-174) builds 10 *independent* per-chunk graphs in parallel —
exactly the shape that distributes.

This module is that Option 1 on Spark, with the graph algorithm implemented
from the published paper (Malkov & Yashunin, arXiv:1603.09320 — greedy
descent from the top layer, ef-beam search on layer 0, geometric level
assignment with mL = 1/ln(M)):

- **build**: corpus → P hash partitions → `applyInPandas` builds one numpy
  HNSW per partition → graph rows `(part_id, vec_id, embedding, neighbors:
  array<array<bigint>>)`, one row per node, neighbor lists per layer.
- **persist**: graph rows *including the vector*, parquet partitioned by
  part_id. This deliberately deviates from the reference's topology-only
  SerializeGraph (Program.cs:231-244) + re-bind-at-load (Program.cs:256):
  at 100 TB a serve-time "re-bind" is a full-corpus shuffle join on every
  query batch. Storing the vector with its node costs ~corpus-sized
  storage once and makes search a join-free partition-local scan.
  ``write_hnsw(topology_only=True)`` restores exact reference parity.
- **search**: fan out every query to every partition graph (the merge the
  reference's Option 1 never wrote), per-partition beam search in
  `applyInPandas`, global top-k via TakeOrderedAndProject. No corpus join:
  vectors ride with the graph rows.

Neighbor selection implements BOTH the paper's simple nearest-M (Alg. 3)
and the heuristic (Alg. 4: SELECT-NEIGHBORS-HEURISTIC with
extendCandidates / keepPrunedConnections). The reference enables the
heuristic variants (NeighbourSelectionRuleType.SelectHeuristic +
ExpandBestSelection, Program.cs:135-137), so ``HNSWParams.heuristic``
defaults to True; set it False for Alg. 3. On clustered data the heuristic
preserves long-range links that pure nearest-M prunes away, which is worth
recall at equal ef (paper §4, Fig. 2 discussion).

IVF (operators/ann.py) remains the default scale path — its probe is a
partition-pruned *scan* with no per-node Python state. HNSW fans out to all
P graphs but touches only ~ef·log(N/P) vectors per graph — the better
latency/recall trade once per-partition corpora are large and resident.

Distance is dot-product distance (1 − a·b), matching the reference's
DotProductDistance (smaller = closer, ascending re-sort Program.cs:219).
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["HNSWParams", "build_hnsw", "write_hnsw", "read_hnsw", "hnsw_search"]


class HNSWParams:
    """Build/search knobs (defaults mirror Program.cs:15,128-138: M=10,
    mL=1/ln M, heuristic neighbor selection with candidate expansion)."""

    def __init__(self, M: int = 10, ef_construction: int = 100,
                 ef_search: int = 64, seed: int = 42,
                 heuristic: bool = True, extend_candidates: bool = True,
                 keep_pruned: bool = True):
        self.M = M
        self.ef_construction = ef_construction
        self.ef_search = ef_search
        self.seed = seed
        self.heuristic = heuristic              # Alg. 4 vs Alg. 3
        self.extend_candidates = extend_candidates  # ExpandBestSelection analog
        self.keep_pruned = keep_pruned          # keepPrunedConnections (Alg. 4)


# ---------------------------------------------------------------------------
# numpy HNSW core (one graph per partition; runs inside applyInPandas)
# ---------------------------------------------------------------------------

def _dist(vectors: np.ndarray, idxs: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Dot-product distance 1 − v·q for a batch of node indexes (one matmul
    — the numpy stand-in for the reference's SIMD kernel, csproj:15)."""
    return 1.0 - vectors[idxs] @ q


# Below this partition size, each insert/search precomputes ALL distances to
# the query with one BLAS GEMV and the beam search just indexes into it —
# ~10× less per-call numpy overhead than gathering rows per expansion. Above
# it, distances are computed lazily per expansion so per-insert work stays
# O(ef·M·log n·d), not O(n·d) — the property that matters when a partition
# holds millions of vectors at 100 TB.
_PRECOMP_MAX = 1 << 14


def _dist_of(vectors: np.ndarray, q: np.ndarray):
    """Distance accessor for one query: precomputed GEMV under
    ``_PRECOMP_MAX``, lazy gathered-matmul above it."""
    if len(vectors) <= _PRECOMP_MAX:
        dq = 1.0 - vectors @ q
        return dq.__getitem__
    return lambda idxs: 1.0 - vectors[idxs] @ q


def _search_layer(dist_of, adj, entry: int, ef: int,
                  visited: np.ndarray) -> list[tuple[float, int]]:
    """Beam search on one layer (paper Alg. 2): maintain the ef best, expand
    the closest unexpanded candidate until no candidate beats the worst.

    ``visited`` is a caller-provided bool scratch array (len = corpus size);
    it is reset here. A flat bool array beats a Python set by ~3-5× on the
    membership test that dominates the insert loop."""
    visited[:] = False
    d0 = float(dist_of(np.array([entry], dtype=np.int64))[0])
    visited[entry] = True
    cand = [(d0, entry)]           # min-heap by distance
    best = [(-d0, entry)]          # max-heap (negated) of the ef best
    while cand:
        d, node = heapq.heappop(cand)
        if d > -best[0][0]:
            break
        neigh = adj.get(node)
        if neigh is None or len(neigh) == 0:
            continue
        new = neigh[~visited[neigh]]
        if len(new) == 0:
            continue
        visited[new] = True
        nds = dist_of(new)
        if len(best) >= ef:
            # batch-filter against the current worst before touching heaps
            worst = -best[0][0]
            ok = nds < worst
            new, nds = new[ok], nds[ok]
        for nd, n in zip(nds.tolist(), new.tolist()):
            if len(best) < ef or nd < -best[0][0]:
                heapq.heappush(cand, (nd, n))
                heapq.heappush(best, (-nd, n))
                if len(best) > ef:
                    heapq.heappop(best)
    return sorted((-nd, n) for nd, n in best)


def _select_neighbors(x: np.ndarray, cands: list[tuple[float, int]], m: int,
                      adj: dict, p: "HNSWParams", dist_of) -> np.ndarray:
    """Neighbor selection for one insert: paper Alg. 3 (simple nearest-M)
    or Alg. 4 (heuristic) per ``p.heuristic`` — the reference's
    SelectHeuristic/ExpandBestSelection pair (Program.cs:135-137).

    Alg. 4: walk candidates in ascending distance-to-q; keep e only if e is
    closer to q than to every already-kept neighbor — this preserves links
    that bridge clusters instead of M redundant intra-cluster edges.

    The working set is capped at max(ef_construction, 2m) nearest (the
    hnswlib convention): keeps the one pairwise candidate-matrix matmul
    bounded even when extendCandidates pulls in every neighborhood."""
    if not p.heuristic:
        return np.array([nid for _, nid in cands[:m]], dtype=np.int64)

    ids = np.array([nid for _, nid in cands], dtype=np.int64)
    dq = np.array([d for d, _ in cands], dtype=np.float64)
    if p.extend_candidates:
        # ExpandBestSelection: widen the working set with candidates'
        # neighborhoods (paper Alg. 4 extendCandidates branch) — gathered
        # and de-duplicated vectorized, distances in one batch.
        nbr_arrays = [adj[int(i)] for i in ids if int(i) in adj]
        if nbr_arrays:
            ext = np.unique(np.concatenate(nbr_arrays))
            ext = ext[~np.isin(ext, ids)]
            if len(ext):
                ids = np.concatenate([ids, ext])
                dq = np.concatenate([dq, dist_of(ext)])
    cap = max(p.ef_construction, 2 * m)
    order = np.argsort(dq, kind="stable")[:cap]
    ids, dq = ids[order], dq[order]

    # pairwise distances among the (capped) candidates — ONE matmul
    C = x[ids]
    dmat = 1.0 - C @ C.T
    # mind[j] = min distance from candidate j to any kept neighbor so far;
    # updated with one vectorized minimum per acceptance instead of a
    # fancy-indexed reduce per candidate.
    mind = np.full(len(ids), np.inf)
    kept: list[int] = []
    pruned: list[int] = []
    for j in range(len(ids)):
        if len(kept) >= m:
            break
        if dq[j] < mind[j]:
            kept.append(j)
            np.minimum(mind, dmat[j], out=mind)
        else:
            pruned.append(j)
    if p.keep_pruned:
        for j in pruned:
            if len(kept) >= m:
                break
            kept.append(j)
    return ids[np.array(kept, dtype=np.int64)]


def _build_graph(x: np.ndarray, p: HNSWParams) -> list[dict[int, np.ndarray]]:
    """Insert-all build (paper Alg. 1). Returns adjacency per layer:
    layers[l][node] = np.array of neighbor node indexes."""
    n = len(x)
    rng = np.random.RandomState(p.seed)
    mL = 1.0 / math.log(p.M)
    levels = np.minimum(
        (-np.log(rng.uniform(1e-12, 1.0, size=n)) * mL).astype(np.int64), 32)
    max_level = int(levels.max()) if n else 0
    layers: list[dict[int, np.ndarray]] = [dict() for _ in range(max_level + 1)]
    entry, entry_level = 0, int(levels[0])
    for lvl in range(entry_level + 1):
        layers[lvl][0] = np.empty(0, dtype=np.int64)
    visited = np.zeros(n, dtype=bool)  # shared scratch for every beam search
    for i in range(1, n):
        dist_of = _dist_of(x, x[i])
        lvl_i = int(levels[i])
        ep = entry
        # greedy descent through layers above the node's level (ef=1)
        for lvl in range(entry_level, lvl_i, -1):
            ep = _search_layer(dist_of, layers[lvl], ep, 1, visited)[0][1]
        # insert with ef_construction beam on each level ≤ node level
        for lvl in range(min(entry_level, lvl_i), -1, -1):
            found = _search_layer(dist_of, layers[lvl], ep, p.ef_construction,
                                  visited)
            m = p.M if lvl > 0 else 2 * p.M  # layer-0 degree 2M (paper §4)
            nbrs = _select_neighbors(x, found, m, layers[lvl], p, dist_of)
            layers[lvl][i] = nbrs
            # back-links + degree cap: keep each neighbor's m nearest
            for nb in nbrs.tolist():
                cur = layers[lvl].get(nb, np.empty(0, dtype=np.int64))
                cur = np.append(cur, i)
                if len(cur) > m:
                    keep = np.argsort(_dist(x, cur, x[nb]))[:m]
                    cur = cur[keep]
                layers[lvl][nb] = cur
            ep = int(found[0][1])
        if lvl_i > entry_level:
            for lvl in range(entry_level + 1, lvl_i + 1):
                layers[lvl][i] = np.empty(0, dtype=np.int64)
            entry, entry_level = i, lvl_i
    return layers


def _graph_knn(x: np.ndarray, layers: list[dict[int, np.ndarray]],
               q: np.ndarray, k: int, ef: int,
               visited: np.ndarray) -> list[tuple[float, int]]:
    """Full search (paper Alg. 5): greedy descent, layer-0 ef-beam, top-k.
    Distances stay LAZY here regardless of partition size: a serve-path
    GEMV over all n rows would cost exactly a brute-force scan per query,
    which is the thing the graph exists to avoid."""
    dist_of = lambda idxs: 1.0 - x[idxs] @ q  # noqa: E731
    entry = next(iter(layers[-1]))
    for lvl in range(len(layers) - 1, 0, -1):
        entry = _search_layer(dist_of, layers[lvl], entry, 1, visited)[0][1]
    found = _search_layer(dist_of, layers[0], entry, max(ef, k), visited)
    return found[:k]


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

_GRAPH_SCHEMA = T.StructType([
    T.StructField("part_id", T.IntegerType()),
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("neighbors", T.ArrayType(T.ArrayType(T.LongType()))),
])


def build_hnsw(corpus: DataFrame, n_partitions: int = 8,
               params: HNSWParams | None = None, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """P independent per-partition graphs (the reference's Option 1,
    Program.cs:140-174, with Parallel.For replaced by executor tasks).
    Output graph rows: (part_id, vec_id, embedding, neighbors[layer][j] =
    vec_id). Neighbor lists store *vec_ids*, not positions — explicit
    identity (SURVEY §7), unlike the reference's positional re-binding.
    The vector rides WITH its node so search never joins the corpus."""
    p = params or HNSWParams()

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__vid", ignore_index=True)  # deterministic insert order
        x = np.stack(pdf["__vec"].to_numpy()).astype(np.float32)
        vids = pdf["__vid"].to_numpy()
        layers = _build_graph(x, p)
        out = []
        for i, vid in enumerate(vids):
            per_layer = [
                [int(vids[j]) for j in layers[lvl][i]]
                for lvl in range(len(layers)) if i in layers[lvl]
            ]
            out.append((int(pdf["__part"].iloc[0]), int(vid),
                        [float(v) for v in x[i]], per_layer))
        return pd.DataFrame(
            out, columns=["part_id", "vec_id", "embedding", "neighbors"])

    prepared = corpus.select(
        F.pmod(F.col(id_col), F.lit(n_partitions)).cast("int").alias("__part"),
        F.col(id_col).alias("__vid"),
        F.col(vec_col).alias("__vec"),
    )
    return prepared.groupBy("__part").applyInPandas(build, _GRAPH_SCHEMA)


def write_hnsw(graph: DataFrame, path: str, topology_only: bool = False) -> None:
    """SerializeGraph analog (Program.cs:231-244): parquet partitioned by
    part_id on DFS — no single machine ever holds the whole index. By
    default the vector is stored with its node (storage ≈ corpus size,
    join-free serve path). ``topology_only=True`` is exact reference
    parity (vectors re-bound at load, Program.cs:256) — cheaper storage,
    but search then needs a corpus join."""
    cols = graph.drop("embedding") if topology_only else graph
    cols.repartition("part_id").write.mode("overwrite") \
        .partitionBy("part_id").parquet(path)


def read_hnsw(spark, path: str) -> DataFrame:
    """DeserializeGraph analog (Program.cs:246-263) — lazy. With the
    default vector-carrying layout no re-binding is needed; a
    topology-only graph re-binds via ``hnsw_search(corpus=...)``."""
    return spark.read.parquet(path)


MAX_QUERY_BATCH = 10_000


def hnsw_search(graph: DataFrame, queries: DataFrame, k: int = 20,
                params: HNSWParams | None = None,
                corpus: DataFrame | None = None,
                id_col: str = "vec_id", vec_col: str = "embedding",
                max_query_batch: int = MAX_QUERY_BATCH) -> DataFrame:
    """KNNSearch analog (Program.cs:216-219), distributed: every query fans
    out to every partition graph; each graph beam-searches its own nodes;
    the global answer is the k best across partitions
    (TakeOrderedAndProject merge — the step the reference's 10-graph
    Option 1 leaves unwritten).

    `queries` is a small (query_id, query_vec) frame, broadcast into every
    partition group. Output: (query_id, vec_id, distance), global top-k
    per query, ascending distance (re-sort parity Program.cs:219).

    The default graph carries its vectors, so the search plan is a single
    partition-local applyInPandas over the graph scan — NO corpus join.
    ``corpus`` is only consulted for topology-only graphs (reference-parity
    persistence), where it re-binds vectors by explicit vec_id join."""
    p = params or HNSWParams()
    if "embedding" not in graph.columns:
        if corpus is None:
            raise ValueError(
                "topology-only graph: pass corpus= to re-bind vectors "
                "(reference parity, Program.cs:256)")
        graph = graph.join(
            corpus.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("embedding")),
            "vec_id",
        )
    spark = graph.sparkSession
    # Serving-side fan-out: the query batch is broadcast to every partition
    # graph, so it must be small BY CONTRACT — and the contract is enforced,
    # not assumed: limit(max+1) bounds the driver pull no matter what the
    # caller hands us, and one row over the cap raises instead of silently
    # collecting a million queries. Batch big query sets upstream.
    qpdf = queries.limit(max_query_batch + 1).toPandas()
    if len(qpdf) > max_query_batch:
        raise ValueError(
            f"hnsw_search query batch exceeds max_query_batch="
            f"{max_query_batch}; split the queries into batches (the serve "
            f"path broadcasts the batch to every partition graph)")
    bq = spark.sparkContext.broadcast(qpdf)

    def search(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.reset_index(drop=True)
        vids = pdf["vec_id"].to_numpy()
        pos = {int(v): i for i, v in enumerate(vids)}
        x = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
        n_layers = int(pdf["neighbors"].map(len).max())
        layers: list[dict[int, np.ndarray]] = [dict() for _ in range(n_layers)]
        for i in range(len(pdf)):
            for lvl, nbrs in enumerate(pdf["neighbors"].iloc[i]):
                layers[lvl][i] = np.array(
                    [pos[int(v)] for v in nbrs], dtype=np.int64)
        out = []
        qp = bq.value
        visited = np.zeros(len(pdf), dtype=bool)
        for _, qrow in qp.iterrows():
            qv = np.asarray(qrow["query_vec"], dtype=np.float32)
            for d, node in _graph_knn(x, layers, qv, k, p.ef_search, visited):
                out.append((int(qrow["query_id"]), int(vids[node]), float(d)))
        return pd.DataFrame(out, columns=["query_id", "vec_id", "distance"])

    partial = graph.groupBy("part_id").applyInPandas(
        search,
        "query_id BIGINT, vec_id BIGINT, distance DOUBLE",
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy("distance", "vec_id")
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k).drop("rank")
        .orderBy("query_id", "distance", "vec_id")
    )
