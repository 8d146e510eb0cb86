"""Shard-size scaling for the suffix-array stack (r10).

suffix_array_rank's registered query is bounded by design (a fixed
16-doc shard — flat at any sf), so its scale claim needs a different
axis: wall time vs SHARD LENGTH n. Theory: ⌈log₂ n⌉ rounds, each a
sort-class shuffle ⇒ t ~ n·log n plus a per-round fixed job cost that
dominates at these sizes. This tool measures the SA build (and the LCP
walk) at n ≈ 4k / 16k / 64k chars (16/64/256 docs) and records the
log-log alpha between successive quadruplings — anything ≫ 1.2 would
mean a round's shuffle is NOT behaving sort-like and the 100 TB claim
fails.

Usage: python tools/suffix_scaling.py   (appends a section to SCALING.md)
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.1"
REPS = 3
DOCS = [16, 64, 256, 1024]


def _chars(spark, n_docs: int):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from parquetaivectorsearch_spark.sources import load_table

    d = (load_table(spark, SF_DIR, "documents")
         .filter(F.col("lang") == "en")
         .orderBy("doc_id").limit(n_docs)
         .select("doc_id", F.substring("text", 1, 256).alias("t")))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    off = d.select(
        "doc_id", "t",
        F.coalesce(F.sum(F.length("t") + 1).over(w), F.lit(0)).alias("off"))
    return off.select(
        "off",
        F.posexplode(F.expr(
            "transform(sequence(1, length(t) + 1),"
            " i -> substring(concat(t, chr(1)), i, 1))")).alias("i", "ch")
    ).select((F.col("off") + F.col("i") + 1).alias("pos"), "ch")


def main() -> None:
    from parquetaivectorsearch_spark.operators.suffix import (
        lcp_adjacent, suffix_array_rounds)
    from parquetaivectorsearch_spark.session import get_spark

    spark = get_spark("pavs-suffix-scaling",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    def run(n_docs: int) -> tuple[int, float, float]:
        chars = _chars(spark, n_docs).localCheckpoint()
        n = chars.count()
        t0 = time.monotonic()
        sa, rounds = suffix_array_rounds(chars, parts=8)
        sa.write.format("noop").mode("overwrite").save()
        t_sa = time.monotonic() - t0
        t0 = time.monotonic()
        lcp_adjacent(sa, rounds).write.format("noop").mode("overwrite").save()
        t_lcp = time.monotonic() - t0
        return n, round(t_sa, 3), round(t_lcp, 3)

    run(DOCS[0])  # warm
    best: dict[int, tuple[int, float, float]] = {}
    for _ in range(REPS):
        for d in DOCS:
            n, t_sa, t_lcp = run(d)
            if d not in best or t_sa + t_lcp < best[d][1] + best[d][2]:
                best[d] = (n, t_sa, t_lcp)

    lines, prev = [], None
    for d in DOCS:
        n, t_sa, t_lcp = best[d]
        alpha = ""
        if prev is not None:
            pn, pt = prev
            alpha = f"{math.log((t_sa + t_lcp) / pt) / math.log(n / pn):.2f}"
        lines.append(f"| {d} | {n} | {t_sa:.3f} | {t_lcp:.3f} | {alpha} |")
        prev = (n, t_sa + t_lcp)
        print(lines[-1])

    md = Path(_REPO) / "SCALING.md"
    text = md.read_text()
    marker = "## Suffix-array shard-size scaling"
    section = (
        f"\n{marker} (tools/suffix_scaling.py)\n\n"
        "suffix_array_rank's registered query is bounded by design (fixed\n"
        "16-doc shard), so the scale axis is shard LENGTH: SA build (prefix\n"
        "doubling) + LCP walk at n ≈ 4k/16k/64k/219k chars, min-of-3, en docs\n"
        "at sf0.1 truncated to 256 chars. Expected t ~ n·log n + R·c where\n"
        "R = ⌈log₂ n⌉ rounds and c the fixed per-round job cost that\n"
        "dominates at these sizes — alpha (log-log slope of total vs n\n"
        "between successive rows) must stay ≲ 1.2 or a round's shuffle is\n"
        "not sort-like and the 100 TB claim fails.\n\n"
        "| docs | n chars | SA s | LCP s | alpha vs prev |\n"
        "|---|---|---|---|---|\n" + "\n".join(lines) + "\n")
    if marker in text:
        i = text.index(marker)
        j = text.find("\n## ", i)
        text = text[:i].rstrip("\n") + "\n" + (
            "" if j == -1 else text[j + 1:])
        # drop the leading "## " duplication guard: section re-inserted below
    md.write_text(text.rstrip("\n") + "\n" + section)
    print(f"wrote section to {md}")
    spark.stop()


if __name__ == "__main__":
    main()
