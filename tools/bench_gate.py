"""Bench-record hygiene gate (VERDICT r11 #2): the r11 artifact of
record carried 3-4× noisy single-run entries (host-side steal bursts)
that misled round-over-round comparison. This gate compares a fresh
BENCH_LAST.json against the controlled min-of-3 references in SCALING.md
(the main table's sf0.1 column plus the 10× table's sf0.1 column) and
FAILS if any shared query exceeds 2× its reference — the signal to
re-record on a quieter machine rather than commit a noisy artifact.

Usage: python tools/bench_gate.py [BENCH_LAST.json]
Exits 0 (all shared queries within 2×) or 1 (lists offenders).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


# The ONLY two tables the gate reads, identified by their exact header
# rows (ADVICE r12: the old shape-based parse — any word-first 4/5-column
# numeric row anywhere in the doc — would silently consume or shadow
# references from a future unrelated A/B table). Value = index of the
# sf0.1 column in each.
_ANCHORED_HEADERS = {
    "| query | sf0.001 s | sf0.01 s | sf0.1 s | alpha(0.01→0.1) |": 3,
    "| query | sf0.1 s | 10x s | alpha |": 1,
}


def scaling_refs() -> dict[str, float]:
    """Min-of-3 sf0.1 references parsed from SCALING.md — ONLY from the
    two anchored tables above (the cross-SF main table and the 10×
    table), each consumed from its header row to the first non-table
    line. Later tables win on duplicates (fresher)."""
    refs: dict[str, float] = {}
    sf01_col: int | None = None
    for line in (_REPO / "SCALING.md").read_text().splitlines():
        stripped = " ".join(line.split())
        if stripped in _ANCHORED_HEADERS:
            sf01_col = _ANCHORED_HEADERS[stripped]
            continue
        if sf01_col is None:
            continue
        if not line.lstrip().startswith("|"):
            sf01_col = None  # table ended
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if not cells or not re.fullmatch(r"\w+", cells[0]):
            continue  # separator row etc.
        try:
            refs[cells[0]] = float(cells[sf01_col])
        except (ValueError, IndexError):
            continue
    return refs


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else str(_REPO / "BENCH_LAST.json")
    rec = json.loads(Path(path).read_text())
    refs = scaling_refs()
    shared = {q: t for q, t in rec["queries"].items() if q in refs}
    # The 2x ratio gate alone is noise-dominated on sub-second queries
    # (a 0.13s delta on a 0.13s reference trips it while meaning
    # nothing), so an offender must ALSO exceed the reference by 0.5s
    # absolute — spark job-scheduling granularity on this host.
    bad = {q: (t, refs[q]) for q, t in shared.items()
           if t > 2 * refs[q] and t - refs[q] > 0.5}
    print(json.dumps({
        "shared": len(shared),
        "offenders": {q: {"record": t, "min_of_3": r, "ratio": round(t / r, 2)}
                      for q, (t, r) in sorted(bad.items())},
        "gate": "pass" if not bad else "FAIL",
    }))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
