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
  HNSW per partition → graph rows `(part_id, vec_id, neighbors:
  array<array<bigint>>)`, one row per node, neighbor lists per layer.
- **persist**: topology rows only, parquet partitioned by part_id — the
  SerializeGraph analog; vectors are NOT stored (reference parity:
  Program.cs:256 re-supplies them at load).
- **search**: re-attach embeddings by joining the corpus on vec_id (explicit
  id identity — never list position, SURVEY §7 hard parts), fan out every
  query to every partition graph (the merge the reference's Option 1 never
  wrote), per-partition beam search in `applyInPandas`, global top-k via
  TakeOrderedAndProject.

IVF (operators/ann.py) remains the default scale path — its probe is a
partition-pruned *scan* with no per-node Python state. HNSW fans out to all
P graphs but touches only ~ef·log(N/P) vectors per graph — the better
latency/recall trade once per-partition corpora are large and resident.

Distance is dot-product distance (1 − a·b), matching the reference's
DotProductDistance (smaller = closer, ascending re-sort Program.cs:219).
Neighbor selection is the paper's simple nearest-M (Alg. 3); the
reference's SelectHeuristic/ExpandBestSelection variants change candidate
pruning, not search semantics.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["HNSWParams", "build_hnsw", "write_hnsw", "read_hnsw", "hnsw_search"]


class HNSWParams:
    """Build/search knobs (defaults mirror Program.cs:15,128-138)."""

    def __init__(self, M: int = 10, ef_construction: int = 100,
                 ef_search: int = 64, seed: int = 42):
        self.M = M
        self.ef_construction = ef_construction
        self.ef_search = ef_search
        self.seed = seed


# ---------------------------------------------------------------------------
# numpy HNSW core (one graph per partition; runs inside applyInPandas)
# ---------------------------------------------------------------------------

def _dist(vectors: np.ndarray, idxs: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Dot-product distance 1 − v·q for a batch of node indexes (one matmul
    — the numpy stand-in for the reference's SIMD kernel, csproj:15)."""
    return 1.0 - vectors[idxs] @ q


def _search_layer(vectors, adj, q, entry: int, ef: int) -> list[tuple[float, int]]:
    """Beam search on one layer (paper Alg. 2): maintain the ef best, expand
    the closest unexpanded candidate until no candidate beats the worst."""
    import heapq

    d0 = float(1.0 - vectors[entry] @ q)
    visited = {entry}
    cand = [(d0, entry)]           # min-heap by distance
    best = [(-d0, entry)]          # max-heap (negated) of the ef best
    while cand:
        d, node = heapq.heappop(cand)
        if d > -best[0][0]:
            break
        neigh = adj.get(node)
        if neigh is None or len(neigh) == 0:
            continue
        new = np.array([n for n in neigh if n not in visited], dtype=np.int64)
        if len(new) == 0:
            continue
        visited.update(new.tolist())
        for nd, n in zip(_dist(vectors, new, q), new):
            nd = float(nd)
            if len(best) < ef or nd < -best[0][0]:
                heapq.heappush(cand, (nd, int(n)))
                heapq.heappush(best, (-nd, int(n)))
                if len(best) > ef:
                    heapq.heappop(best)
    return sorted((-nd, n) for nd, n in best)


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
    for i in range(1, n):
        q = x[i]
        lvl_i = int(levels[i])
        ep = entry
        # greedy descent through layers above the node's level (ef=1)
        for lvl in range(entry_level, lvl_i, -1):
            ep = _search_layer(x, layers[lvl], q, ep, 1)[0][1]
        # insert with ef_construction beam on each level ≤ node level
        for lvl in range(min(entry_level, lvl_i), -1, -1):
            found = _search_layer(x, layers[lvl], q, ep, p.ef_construction)
            m = p.M if lvl > 0 else 2 * p.M  # layer-0 degree 2M (paper §4)
            nbrs = np.array([nid for _, nid in found[:m]], dtype=np.int64)
            layers[lvl][i] = nbrs
            # back-links + degree cap: keep each neighbor's m nearest
            for nb in nbrs:
                cur = layers[lvl].get(int(nb), np.empty(0, dtype=np.int64))
                cur = np.append(cur, i)
                if len(cur) > m:
                    keep = np.argsort(_dist(x, cur, x[nb]))[:m]
                    cur = cur[keep]
                layers[lvl][int(nb)] = cur
            ep = found[0][1]
        if lvl_i > entry_level:
            for lvl in range(entry_level + 1, lvl_i + 1):
                layers[lvl][i] = np.empty(0, dtype=np.int64)
            entry, entry_level = i, lvl_i
    return layers


def _graph_knn(x: np.ndarray, layers: list[dict[int, np.ndarray]],
               q: np.ndarray, k: int, ef: int) -> list[tuple[float, int]]:
    """Full search (paper Alg. 5): greedy descent, layer-0 ef-beam, top-k."""
    entry = next(iter(layers[-1]))
    for lvl in range(len(layers) - 1, 0, -1):
        entry = _search_layer(x, layers[lvl], q, entry, 1)[0][1]
    found = _search_layer(x, layers[0], q, entry, max(ef, k))
    return found[:k]


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

_GRAPH_SCHEMA = T.StructType([
    T.StructField("part_id", T.IntegerType()),
    T.StructField("vec_id", T.LongType()),
    T.StructField("neighbors", T.ArrayType(T.ArrayType(T.LongType()))),
])


def build_hnsw(corpus: DataFrame, n_partitions: int = 8,
               params: HNSWParams | None = None, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """P independent per-partition graphs (the reference's Option 1,
    Program.cs:140-174, with Parallel.For replaced by executor tasks).
    Output topology rows: (part_id, vec_id, neighbors[layer][j] = vec_id).
    Neighbor lists store *vec_ids*, not positions — explicit identity
    (SURVEY §7), unlike the reference's positional re-binding."""
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
            out.append((int(pdf["__part"].iloc[0]), int(vid), per_layer))
        return pd.DataFrame(out, columns=["part_id", "vec_id", "neighbors"])

    prepared = corpus.select(
        F.pmod(F.col(id_col), F.lit(n_partitions)).cast("int").alias("__part"),
        F.col(id_col).alias("__vid"),
        F.col(vec_col).alias("__vec"),
    )
    return prepared.groupBy("__part").applyInPandas(build, _GRAPH_SCHEMA)


def write_hnsw(graph: DataFrame, path: str) -> None:
    """SerializeGraph analog (Program.cs:231-244): topology only, parquet
    partitioned by part_id on DFS — no single machine ever holds the whole
    index."""
    graph.repartition("part_id").write.mode("overwrite") \
        .partitionBy("part_id").parquet(path)


def read_hnsw(spark, path: str) -> DataFrame:
    """DeserializeGraph analog (Program.cs:246-263) — lazy; vectors are
    re-attached per search (see hnsw_search), mirroring the reference's
    vector re-binding at load (Program.cs:256)."""
    return spark.read.parquet(path)


def hnsw_search(graph: DataFrame, corpus: DataFrame, queries: DataFrame,
                k: int = 20, params: HNSWParams | None = None,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """KNNSearch analog (Program.cs:216-219), distributed: every query fans
    out to every partition graph; each graph beam-searches its own nodes;
    the global answer is the k best across partitions
    (TakeOrderedAndProject merge — the step the reference's 10-graph
    Option 1 leaves unwritten).

    `queries` is a small (query_id, query_vec) frame, broadcast-joined into
    every partition group. Output: (query_id, vec_id, distance), global
    top-k per query, ascending distance (re-sort parity Program.cs:219).
    """
    p = params or HNSWParams()
    spark = graph.sparkSession
    qpdf = queries.toPandas()  # serving-side fan-out: queries are few by contract
    bq = spark.sparkContext.broadcast(qpdf)

    def search(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.reset_index(drop=True)
        vids = pdf["vec_id"].to_numpy()
        pos = {int(v): i for i, v in enumerate(vids)}
        x = np.stack(pdf["emb"].to_numpy()).astype(np.float32)
        n_layers = int(pdf["neighbors"].map(len).max())
        layers: list[dict[int, np.ndarray]] = [dict() for _ in range(n_layers)]
        for i in range(len(pdf)):
            for lvl, nbrs in enumerate(pdf["neighbors"].iloc[i]):
                layers[lvl][i] = np.array(
                    [pos[int(v)] for v in nbrs], dtype=np.int64)
        out = []
        qp = bq.value
        for _, qrow in qp.iterrows():
            qv = np.asarray(qrow["query_vec"], dtype=np.float32)
            for d, node in _graph_knn(x, layers, qv, k, p.ef_search):
                out.append((int(qrow["query_id"]), int(vids[node]), float(d)))
        return pd.DataFrame(out, columns=["query_id", "vec_id", "distance"])

    with_vec = graph.join(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb")),
        "vec_id",
    )
    partial = with_vec.groupBy("part_id").applyInPandas(
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
