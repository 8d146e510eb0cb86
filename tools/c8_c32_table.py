"""Per-query c8/c32 scaling table (VERDICT r14 #6): read two bench
artifacts (same methodology, different $SPARK_GRAFT_CPUS) and append a
markdown table of per-query ratios to SCALING.md.

Usage: python tools/c8_c32_table.py BENCH_c32.json BENCH_c8.json
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    c32 = json.loads(Path(sys.argv[1]).read_text())
    c8 = json.loads(Path(sys.argv[2]).read_text())
    q32, q8 = c32["queries"], c8["queries"]
    shared = sorted(set(q32) & set(q8))
    rows = [(n, q8[n], q32[n], q8[n] / q32[n] if q32[n] else float("nan"))
            for n in shared]
    rows.sort(key=lambda r: -r[3])
    lines = [
        "",
        "## r15 per-query c8 / c32 ratios (VERDICT r14 #6)",
        "",
        f"From `{Path(sys.argv[1]).name}` (local[32], total "
        f"{c32['value']} s) and `{Path(sys.argv[2]).name}` (local[8], "
        f"total {c8['value']} s), same bench methodology and SF. Ratio "
        "t(c8)/t(c32) ≈ 1 (or < 1) means the query is floored by job "
        "scheduling / driver dispatch at this SF, not compute — extra "
        "cores buy nothing locally and the committed plan shapes, not "
        "local wall-clock, carry the scale claim. Ratios well above 1 "
        "mark the queries that DO saturate cores at sf0.1.",
        "",
        "| query | c8 s | c32 s | c8/c32 |",
        "|---|---|---|---|",
    ]
    for n, t8, t32, r in rows:
        lines.append(f"| {n} | {t8:.2f} | {t32:.2f} | {r:.2f} |")
    import statistics
    med = statistics.median(r for *_, r in rows)
    lines += ["",
              f"Suite: Σc8 {sum(q8[n] for n in shared):.1f} s vs "
              f"Σc32 {sum(q32[n] for n in shared):.1f} s over "
              f"{len(shared)} shared queries; median ratio {med:.2f}.",
              ""]
    with open(_REPO / "SCALING.md", "a") as f:
        f.write("\n".join(lines))
    print(f"appended {len(rows)} rows, median ratio {med:.2f}")


if __name__ == "__main__":
    main()
