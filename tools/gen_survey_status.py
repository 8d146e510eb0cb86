"""Regenerate SURVEY.md §8 (implementation status) from the live query
registry, so the per-module tables can never drift from the code again
(VERDICT r10 noted a 4-query §2/§8 bookkeeping gap — generation beats
bookkeeping).

Usage: python tools/gen_survey_status.py [round-note]
Replaces everything from the '## 8.' header to EOF (§8 is the last
section of SURVEY.md).
"""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


#: Hand-maintained rationale annotations appended to the check
#: column (why a rows-only entry is still trustworthy, or what
#: makes an oracle construction notable).
NOTES = {
    'ann_filtered_auto':
        'strategy-routed serve (filtered_ann_strategy): fixture lands exact_filtered, recall 1.0 by definition; crossover pinned in tests/test_hnsw.py',
    'ann_filtered_topk':
        'recall column vs exact filtered top-k; full-probe ≡ exact in tests/test_ann.py',
    'ann_hnsw_filtered':
        'filtered recall vs exact FILTERED oracle; scale-safe admission build side (r11)',
    'ann_index_stats':
        'size/imbalance invariants in tests/test_ann.py',
    'ann_ivf_bulk':
        'Arrow-bulk IVF serve; id-parity + recall pinned in tests/test_ann.py',
    'ann_range_search':
        'recall column vs exact radius set; full-probe ≡ exact in tests/test_ann.py',
    'audio_mfcc':
        'gain-shifts-only-c0 whole-chain property',
    'blocklist_scan':
        '|docs|×|patterns| contains join',
    'bq_asymmetric_rank':
        'sequential-fold signed gather',
    'compression_ratio':
        'zlib bytes not SQL-replayable; regime test',
    'dbscan_blocked':
        'planted-clone agreement + under-merge containment vs exact',
    'dbscan_embeddings':
        'recursive-CTE closure; roles + min-label canon',
    'dedup_audio':
        'df_cap=64 + offset-coherence verify; true-dup recall 1.0 at every measured cap',
    'dedup_minhash_incremental':
        'composes exactly to the batch pipeline, tests/test_dedup.py',
    'dedup_phash':
        'chunk df_cap + exact-clique star rescue (r11); best-match framing',
    'dedup_clusters_star':
        'same recursive-CTE closure oracle as dedup_clusters; O(log n) large/small-star contraction (r11)',
    'kmeans_clusters':
        'distributed Lloyd, FULL iteration replayed as unrolled CTEs: seed/assign/update/tie-break all hash-checked (r12); auto tier = arrow since the r14 threshold retune (bench A/B 3x)',
    'kmeans_clusters_literal':
        'the zero-Python literal codegen-fold plan FORCED (auto picks arrow at 8x64 since r14), hash-checked against the same unrolled oracle so the literal tier keeps driver-level evidence (r14)',
    'kmeans_clusters_arrow':
        'the broadcast-matmul assignment tier (auto-selected above k*d=256 since the r14 retune; the only tier that compiles at the reference 1536-dim regime) hash-checked against the SAME unrolled oracle; tier parity + plan pins in tests/test_kmeans.py (r13)',
    'kmeans_seeded_clusters':
        'composed kmeans||->Lloyd at k=16/arrow (VERDICT r13 #2); seeding rows-only by nature, the frozen-seed Lloyd half hash-gated via kmeans_oracle_sql(seeds=...) VALUES replay in tests/test_kmeans.py (r14)',
    'streaming_kmeans_rounds':
        'oracle (multi-round streaming k-means: R epochs of frozen-assignment linear (sum,n) folds re-seeded with 9dp-rounded means == R batch Lloyd rounds, hash-checked vs the R-round unrolled-CTE oracle; batch equality + 4-file fold invariance pinned in tests) (r14)',
    'ann_ivf_distributed':
        'IVF built by the FULL-CORPUS distributed trainer (kmeans|| -> arrow Lloyd, VERDICT r13 #1); recall column on the serve, trainer recall-parity vs sampled + byte determinism pinned in tests/test_ann.py (r14)',
    'streaming_kmeans_update':
        'oracle (streaming Lloyd update step: frozen-seed assignment, linear (sum,n) fold across micro-batches, one staged file -> one emission == the batch one-step update, hash-checked vs the unrolled a1/c1 CTEs; 4-batch fold invariance pinned in tests) (r13)',
    'kmeans_parallel_init':
        'k-means|| seeding (Bahmani 2012): hash-uniform Bernoulli sampling prop. to d2, bounded driver pulls, fixed-RNG weighted-kmeans++ reduction; first-k-trap recovery + determinism + partitioning-invariance pinned in tests/test_kmeans.py (r13)',
    'streaming_cms_merge':
        'cell-wise-add fold == batch cms_build, exact integer equality incl. split-source two-batch run (r12)',
    'streaming_kmv_distinct':
        'bottom-k-of-union fold == batch synopsis + estimate, exact equality incl. two-batch run (r12)',
    'dedup_substring_exact':
        'both tiers replayed: winnow CTEs + direct suffix sort (r11 capstone)',
    'dedup_substring_removal':
        'stitched clean_md5 hash-checked',
    'dedup_video':
        'df_cap=64 stop-hash bound; planted-black-frame regression (r11)',
    'heavy_hitters':
        'two-pass Misra-Gries == naive exact groupBy',
    'hilbert_layout':
        'generated-unroll parity; unit-step + tighter-boxes-than-Morton properties',
    'image_features_jpeg':
        'baseline JPEG codec tier, operators/jpeg.py; error-bounded vs raw tier in tests/test_multimodal.py',
    'image_features_png':
        'stdlib PNG decode tier; bit-equal to raw tier in tests/test_multimodal.py',
    'image_hog':
        'uniform-zero + step-edge-bin properties',
    'ivf_compact_maintenance':
        'maintenance summary; invariants pinned in tests/test_ann.py',
    'ivf_opq_topk':
        'residual-OPQ MSE ≤ plain-residual pinned; recall column',
    'ivf_pq_residual':
        'residual MSE < raw pinned; recall column',
    'ivf_pq_topk':
        'nprobe=nlist == flat PQ pinned; recall column',
    'knn_join_int8_bulk':
        'Arrow int8 shortlist + exact rerank; id-parity in tests/test_knn.py',
    'knn_topk_binary':
        'shortlist→rerank output is approximate; the deterministic Hamming-ranking half is hash-checked by bq_hamming_rank',
    'longest_repeated_substring':
        'adjacent-LCP by bounded prefix comparison; 512 cap both sides',
    'mmr_rerank':
        'hash-gated twin: mmr_rerank_exact in queries_vector',
    'mmr_rerank_exact':
        'recursive-CTE greedy replay; gated floats pre-rounded from matching sequential folds',
    'opq_topk':
        'RᵀR=I + MSE ≤ plain PQ pinned; recall column',
    'pagerank_simgraph_full':
        'ANN edge set; recall pinned in tests/test_ann.py',
    'pca_project_embeddings':
        'sign-ambiguous eigenvectors; invariants in tests/test_pca.py',
    'priority_sample':
        'IEEE-division keys; TakeOrdered plan pinned',
    'priority_sample_grouped':
        'per-group τ; WindowGroupLimit pinned',
    'random_walks':
        'hash-driven walks, 5-CTE chain',
    'rolling_distinct_users':
        'grid-join exact rolling distinct',
    'sa_repeat_pairs':
        'full chain recomputed independently',
    'seasonal_decompose':
        'integer-cents numerators, one division per double',
    'streaming_distinct_hll':
        '±5% vs exact; two-batch merge == one-batch, pinned',
    'streaming_heavy_hitters':
        'no-shrink regime == batch GROUP BY; shrink path pinned in tests/test_sketch.py',
    'suffix_array_rank':
        'rank-for-rank vs direct suffix sort',
    'temperature_mixture':
        'sqrt/ceil quota; WindowGroupLimit pinned',
}

def main() -> None:
    from parquetaivectorsearch_spark.queries import all_oracles, all_queries

    qs, ors = all_queries(), all_oracles()
    note = sys.argv[1] if len(sys.argv) > 1 else ""
    by_module: dict[str, list[str]] = defaultdict(list)
    for name, fn in qs.items():
        by_module[fn.__module__.split(".")[-1]].append(name)

    lines = [
        "## 8. Implementation status (generated from the live registry)",
        "",
        f"{len(qs)} registered driver queries, {len(ors)} oracle-checked"
        f"{' (' + note + ')' if note else ''}. Rows-only entries are "
        "approximate/UDF/binary-output operators per §5; each carries "
        "value-level assertions in `tests/`. This section is GENERATED "
        "by tools/gen_survey_status.py — edit that, not this.",
        "",
    ]
    for mod in sorted(by_module):
        lines += [f"### `{mod}`", "", "| query | check |", "|---|---|"]
        for name in sorted(by_module[mod]):
            check = "oracle" if name in ors else "rows-only"
            if name in NOTES:
                check += f" ({NOTES[name]})"
            lines.append(f"| `{name}` | {check} |")
        lines.append("")

    survey = _REPO / "SURVEY.md"
    text = survey.read_text()
    head, sep, _tail = text.partition("## 8.")
    assert sep, "SURVEY.md has no §8 header"
    survey.write_text(head + "\n".join(lines).rstrip() + "\n")
    print(f"§8 regenerated: {len(qs)} queries, {len(ors)} oracle-checked, "
          f"{len(by_module)} modules")


if __name__ == "__main__":
    main()
