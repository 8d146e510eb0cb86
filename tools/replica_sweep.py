"""Full-registry driver-replica sweep (VERDICT r7 item 6): run EVERY
registered query against its DuckDB oracle (or rows-only execution) in
one fresh process, exactly the way the round driver's t2 gate does, and
record a per-query JSON artifact.

The per-round driver samples a 50-query window; this sweep is the
regression net for the other ~150 — rounds where the window cannot cover
everything still get whole-registry local evidence on record. Reuses the
strict canonicalizer/gates from tests/test_oracle_parity.py (DECIMAL ban,
driver-hashable schema, plan hygiene, representation-sensitive value
hash) so a pass here is the same bar as the pytest suite, plus a written
artifact.

Usage: python tools/replica_sweep.py [out.json]
       (default out: REPLICA_SWEEP_r08.json in the repo root)
       SWEEP_SF_DIR overrides the scale factor (default tests' sf0.01) —
       VERDICT r8 #6 runs the whole registry once at sf0.1, where
       window-tie, skew-cap, and AQE-plan-flip wrongness would hide
       below the driver's sf.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else f"{_REPO}/REPLICA_SWEEP_r08.json"

    import duckdb

    from parquetaivectorsearch_spark import queries as Q
    from parquetaivectorsearch_spark.session import get_spark
    from tests.conftest import SF_CORRECT, register_views
    from tests.test_oracle_parity import (
        _assert_driver_hashable,
        _assert_no_decimal,
        _assert_plan_hygiene,
        _canon_rows,
    )

    sf_dir = os.environ.get("SWEEP_SF_DIR", SF_CORRECT)
    spark = get_spark("pavs-replica-sweep",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    register_views(duck, sf_dir)

    queries, oracles = Q.all_queries(), Q.all_oracles()
    only = os.environ.get("SWEEP_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        queries = {n: f for n, f in queries.items() if n in keep}
    results: dict[str, dict] = {}
    t_start = time.monotonic()
    n_hash = n_rows_only = n_fail = 0
    for name in sorted(queries):
        t0 = time.monotonic()
        row: dict = {"mode": "oracle" if name in oracles else "rows_only"}
        try:
            sdf = queries[name](spark, sf_dir)
            _assert_no_decimal(sdf.schema, name)
            _assert_driver_hashable(sdf.schema, name)
            _assert_plan_hygiene(sdf, name)
            if name in oracles:
                got = sdf.toPandas()
                want = duck.execute(oracles[name]).df()
                row["spark_rows"], row["oracle_rows"] = len(got), len(want)
                assert len(got) == len(want), "row count mismatch"
                assert sorted(got.columns) == sorted(want.columns), (
                    f"columns {sorted(got.columns)} != {sorted(want.columns)}")
                assert _canon_rows(got) == _canon_rows(want), "value hash mismatch"
                row["status"] = "hash_pass"
                n_hash += 1
            else:
                row["spark_rows"] = sdf.count()
                row["status"] = "rows_ran"
                n_rows_only += 1
        except Exception as e:  # noqa: BLE001 — the artifact records failures
            row["status"] = "FAIL"
            row["err"] = f"{type(e).__name__}: {e}"[:500]
            traceback.print_exc()
            n_fail += 1
        row["sec"] = round(time.monotonic() - t0, 3)
        results[name] = row
        print(f"{row['status']:>9}  {name}  ({row['sec']}s)", flush=True)

    artifact = {
        "sf_dir": sf_dir,
        "total": len(queries),
        "hash_pass": n_hash,
        "rows_ran": n_rows_only,
        "fail": n_fail,
        "wall_sec": round(time.monotonic() - t_start, 1),
        "queries": results,
    }
    Path(out_path).write_text(json.dumps(artifact, indent=1))
    print(f"\n{n_hash} hash_pass + {n_rows_only} rows_ran + {n_fail} FAIL "
          f"of {len(queries)} → {out_path}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
