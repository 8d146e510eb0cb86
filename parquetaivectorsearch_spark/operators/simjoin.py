"""Exact all-pairs similarity θ-join, tiled for distributed execution.

The reference's core operation is similarity search over one query
(Program.cs:207-227); the θ-join generalization ("every pair with
cosine ≥ θ") is SURVEY §2.3's similarity join. An exact θ-join is
inherently quadratic — the scalable shape is not a single cartesian but
the M-bucket tiling of Okcan & Riedewald ("Processing Theta-Joins using
MapReduce", SIGMOD'11): split the corpus into B id-blocks, enumerate the
B·(B+1)/2 unordered block tiles as a tiny broadcast relation, and turn
the cross product into two equi-joins so each task computes exactly one
(n/B)×(n/B) tile with bounded memory:

    corpus ⋈ tiles on (block = bi)   -- broadcast hash join, ×(B−i) fan-out
           ⋈ corpus on (bj = block)  -- shuffle hash join, co-located tiles

Every unordered pair lands in exactly one tile (cross-block pairs in the
(min,max)-block tile; same-block pairs de-duped by id order), so the
result is EXACT — no LSH/IVF recall loss — while the plan contains no
CartesianProduct / BroadcastNestedLoopJoin node. Shuffle volume is
O(n·B); pick B ≈ sqrt(2·cluster parallelism). Approximate-but-cheaper
variants live in ann.py (IVF blocking) and dedup.py (MinHash bands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parquetaivectorsearch_spark.functions import vector as V

__all__ = ["all_pairs_similarity_join"]


def all_pairs_similarity_join(
    emb: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine θ-join over the FULL corpus: (vec_a, vec_b, cosine)
    for every unordered pair with cosine ≥ threshold, vec_a < vec_b.

    Bit-deterministic: the sequential-fold cosine (functions/vector.py)
    is evaluated once per pair, and IEEE multiply commutativity makes
    cos(a,b) ≡ cos(b,a) bitwise, so orientation inside a tile never
    changes the value — a DuckDB oracle hash-matches."""
    spark = emb.sparkSession
    tiles = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi: int, bj: int",
    )
    a = emb.select(
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("ba"),
        F.col(id_col).alias("ida"),
        F.col(vec_col).alias("va"),
    )
    b = emb.select(
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("bb"),
        F.col(id_col).alias("idb"),
        F.col(vec_col).alias("vb"),
    )
    pairs = (
        a.join(F.broadcast(tiles), F.col("ba") == F.col("bi"))
        .join(b, F.col("bj") == F.col("bb"))
        # same-block tile: keep one orientation; cross-block tiles are
        # already unique (each unordered pair appears in exactly one tile)
        .filter((F.col("bi") != F.col("bj")) | (F.col("ida") < F.col("idb")))
    )
    cos = V.cosine_similarity("va", "vb")
    return (
        pairs.select(
            F.least("ida", "idb").alias("vec_a"),
            F.greatest("ida", "idb").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )
