"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the `noop` sink (full execution, no
driver-side collect — the 100 TB posture), timed with time.monotonic().
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: one per engine area (scan, relational, window, vector
# search, dedup, text analysis) — the queries a reference user actually runs.
HEADLINE = [
    "scan_parquet",        # parquet scan + projection (ingest phase)
    "sum_tokens",          # global agg (token accounting, Program.cs:111)
    "groupby_agg",         # hash agg w/ partial combine
    "join_orders_customer",# shuffle join
    "join_broadcast_nation",# broadcast join
    "pricing_summary",     # TPC-H Q1 shape: fact-table scan-filter-agg
    "regional_revenue",    # TPC-H Q5 shape: 5-way join tree, broadcast dims
    "window_rank",         # window top-N per group
    "vocab_top_words",     # corpus vocabulary head (explode+count+top-k)
    "dot_product",         # distance kernel over the whole corpus
    "knn_topk",            # FLAGSHIP: exact top-20 by dot-product distance
    "knn_join",            # batch-of-queries KNN
    "ann_topk",            # IVF build + persist + load + search
    "dedup_exact",         # exact dedup groupBy
    "dedup_minhash",       # MinHash+LSH near-dup pipeline
    "dedup_simhash",       # SimHash near-dup pipeline
    "text_stats",          # per-doc text analysis
    "asof_join",           # temporal as-of join (union + carry window)
    "range_join",          # bounded range self-join (time-cell bucketed)
    "tumbling_window_agg", # event-time window agg (batch mode)
    "streaming_tumbling_agg",  # same agg through Structured Streaming
    "image_features",      # multimodal: mapInPandas numpy decode
]


def main() -> None:
    # The engine's session factory: same knobs as a real deployment (AQE,
    # Arrow for pandas interchange, shuffle partitions sized to cores).
    # Arrow in particular matters even for tiny createDataFrame calls —
    # without it, a 10-row metadata frame takes the pickled-RDD path and
    # costs ~5 s of Python-worker spin-up.
    from parquetaivectorsearch_spark.session import get_spark

    spark = get_spark(
        "parquetaivectorsearch-bench",
        cpus=int(CPUS),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    # Warm up the JVM / file listing / codegen paths once so the first timed
    # query measures the operator, not session startup.
    qs["count_rows"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.monotonic()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
