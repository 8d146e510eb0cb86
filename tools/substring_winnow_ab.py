"""A/B: md5-string vs xxhash64-long winnow selection in the HASHED
substring-dedup path (VERDICT r11 #5 — dedup_substring was the 10× table's
worst alpha at 0.76, and the hypothesis to test was that the winnow
window SHUFFLE dominates; the counter-hypothesis is that the per-position
md5 + 42-char key-string build in the SELECTION scan dominates, since the
shuffle already ships 8-byte keys at ~2/(stride+1) density).

Arms (identical plans after the window stage — one repartition("win"),
stop-window agg, self-join, pair agg):
  md5-sel   — the pre-r12 hashed path: md5‖position string keys,
              array_min over string comparisons, substring re-extraction,
              xxhash64 of the selected window (rebuilt inline here; the
              operator no longer exposes it).
  xxh-sel   — the r12 hashed path (operators/dedup.substring_dup_pairs
              hashed=True): xxhash64 long keys, numeric array_min, the
              selected hash IS the join key.

Measures min-of-3 forced end-to-end (noop sink) at sf0.1 and the 10×
corpus (tools/sf10x.py), prints one JSON line per arm×scale plus the 10×
alpha per arm. Usage: python tools/substring_winnow_ab.py
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

WINDOW, STRIDE, CAP = 32, 16, 10


def _pairs_from_wins(wins: DataFrame) -> DataFrame:
    wins = wins.repartition("win").distinct().localCheckpoint(eager=False)
    keep = (wins.groupBy("win").agg(F.count("*").alias("n_docs"))
            .filter((F.col("n_docs") >= 2) & (F.col("n_docs") <= CAP))
            .select("win"))
    b = wins.select("win", F.col("doc_id").alias("doc_b"))
    return (wins.join(keep, "win").join(b, "win")
            .filter(F.col("doc_id") < F.col("doc_b"))
            .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
            .agg(F.count("*").alias("n_shared_windows")))


def md5_sel_pairs(docs: DataFrame) -> DataFrame:
    """The pre-r12 hashed path, verbatim semantics."""
    from parquetaivectorsearch_spark.operators.dedup import _winnow_exprs

    d = docs.filter(F.length("text") >= WINDOW)
    keys, sel = _winnow_exprs("text", WINDOW, STRIDE)
    win = F.expr(
        f"substring(text, cast(substring(__sdp_wk, 33, 10) as int),"
        f" {WINDOW})").alias("win")
    wins = (d.withColumn("__sdp_keys", F.expr(keys))
            .withColumn("__sdp_wk", F.explode(F.expr(sel)))
            .select(F.col("doc_id").alias("doc_id"), win)
            .select("doc_id", F.xxhash64("win").alias("win")))
    return _pairs_from_wins(wins)


def xxh_sel_pairs(docs: DataFrame) -> DataFrame:
    from parquetaivectorsearch_spark.operators.dedup import (
        substring_dup_pairs)

    return substring_dup_pairs(docs, window=WINDOW, stride=STRIDE,
                               max_docs_per_window=CAP, hashed=True)


def reg_pairs(docs: DataFrame) -> DataFrame:
    """The REGISTERED query's path (hashed=False since r12: md5-string
    selection, md5-prefix bigint join keys) — the 0.54-alpha row this
    r13 A/B attacks."""
    from parquetaivectorsearch_spark.operators.dedup import (
        substring_dup_pairs)

    return substring_dup_pairs(docs, window=WINDOW, stride=STRIDE,
                               max_docs_per_window=CAP, hashed=False)


# r13 arm (VERDICT r12 #6): shed the per-position md5 from the ORACLE
# path too. Selection runs on an integer polynomial window hash —
# (Σ c·B^j) mod P, P prime < 2^40 so the packed (hash·2^23 + position)
# sort key AND the fold's acc·B + c both stay inside int64 under ANSI —
# and md5 (the 60-bit-prefix join key DuckDB replays) is computed ONLY
# at the ~2/(stride+1) winnow-selected positions. Every step is exact
# integer/md5 arithmetic DuckDB 1.0 replays verbatim (list_transform +
# list_reduce + list_slice + list_min + '0x'||substr), unlike the
# xxhash64 selection which no DuckDB build exposes. Position cap 2^23
# chars/doc (8M) from the packing; selection hash ties across DIFFERENT
# contents in one run (~stride²/2⁴⁰) fall back to leftmost-position —
# still deterministic, replayed identically, marginally non-content-
# defined for that run only.
POLY_B, POLY_P = 131, 1099511627689  # P prime, < 2^40
POS_PACK = 1 << 23


def poly_sel_pairs(docs: DataFrame) -> DataFrame:
    d = docs.filter((F.length("text") >= WINDOW)
                    & (F.length("text") < POS_PACK))
    n_w = f"(length(text) - {WINDOW - 1})"
    keys = (f"transform(sequence(1, {n_w}), i ->"
            f" aggregate(slice(__ch, i, {WINDOW}), cast(0 as bigint),"
            f" (a, c) -> (a * {POLY_B} + ascii(c)) % {POLY_P})"
            f" * {POS_PACK} + (i - 1))")
    sel = (f"array_distinct(transform(sequence(1, {n_w}), q ->"
           f" array_min(slice(__sdp_keys, q, {STRIDE}))))")
    return _pairs_from_wins(
        d.withColumn("__ch", F.split(F.col("text"), ""))
        .withColumn("__sdp_keys", F.expr(keys))
        .select("doc_id", "text", F.explode(F.expr(sel)).alias("pk"))
        .withColumn("pos", (F.col("pk") % POS_PACK + 1).cast("int"))
        .select("doc_id",
                F.conv(F.substring(
                    F.md5(F.expr(f"substring(text, pos, {WINDOW})")),
                    1, 15), 16, 10).cast("bigint").alias("win")))


def main() -> None:
    from parquetaivectorsearch_spark.session import get_spark
    from tools.sf10x import TENX, build_10x

    spark = get_spark("pavs-winnow-ab",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    build_10x(spark)

    srcs = {
        "sf0.1": "/root/testdata/sf0.1/documents.parquet",
        "10x": f"{TENX}/documents.parquet",
    }
    arms = {"md5-sel": md5_sel_pairs, "xxh-sel": xxh_sel_pairs,
            "reg-md5": reg_pairs, "poly-sel": poly_sel_pairs}
    t: dict[str, dict[str, float]] = {a: {} for a in arms}
    # warm both arms at both scales, then min-of-3 interleaved
    for scale, path in srcs.items():
        docs = spark.read.parquet(path)
        for arm, fn in arms.items():
            fn(docs).write.format("noop").mode("overwrite").save()
    for _ in range(3):
        for scale, path in srcs.items():
            docs = spark.read.parquet(path)
            for arm, fn in arms.items():
                t0 = time.monotonic()
                fn(docs).write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                t[arm][scale] = min(t[arm].get(scale, float("inf")), dt)
    out = {}
    for arm in arms:
        alpha = math.log10(t[arm]["10x"] / t[arm]["sf0.1"])
        out[arm] = {"sf0.1": round(t[arm]["sf0.1"], 3),
                    "10x": round(t[arm]["10x"], 3),
                    "alpha": round(alpha, 2)}
    # sanity: pair sets at sf0.1 (content-defined selections may differ
    # on sub-guarantee incidental pairs; overlap shows how much)
    docs = spark.read.parquet(srcs["sf0.1"])
    a = {(r.doc_a, r.doc_b) for r in md5_sel_pairs(docs).collect()}
    b = {(r.doc_a, r.doc_b) for r in xxh_sel_pairs(docs).collect()}
    c = {(r.doc_a, r.doc_b) for r in reg_pairs(docs).collect()}
    p = {(r.doc_a, r.doc_b) for r in poly_sel_pairs(docs).collect()}
    out["pairs_sf0.1"] = {"md5": len(a), "xxh": len(b),
                          "reg": len(c), "poly": len(p),
                          "md5_xxh_equal": a == b,
                          "reg_poly_overlap": len(c & p)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
