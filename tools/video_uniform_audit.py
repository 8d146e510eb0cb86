"""10× stress for video_matches on a planted-uniform-frame corpus
(VERDICT r10 #2's measurement half; the regression test is
tests/test_multimodal.py::test_video_matches_df_cap_kills_black_frame_background).

Corpus shape: every clip carries 16 SHARED frames (one all-black +
15 title-card-style frames common to the whole corpus — the
real-video background audio_fp_matches' vocabulary problem maps to)
plus 4 unique frames; clip i in the second half duplicates clip
i − n/2 exactly. Shared/total = 16/20 = 0.8, so UNcapped every
background pair crosses the containment threshold and both the bucket
join and the output go quadratic in corpus size; capped (df_cap=64)
the shared hashes drop from numerator and denominators and only the
planted true duplicates survive.

Reports wall (min of REPS) and pair counts at n and 10n for both
modes, and the log-log alpha. Usage: python tools/video_uniform_audit.py
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

N_BASE = 120
REPS = 3
H, W = 12, 10
SHARED, UNIQUE = 16, 4


def corpus(spark, n):
    from parquetaivectorsearch_spark.operators.multimodal import MEDIA_SCHEMA

    rng = np.random.default_rng(77)
    shared = [np.zeros((1, H, W, 1), dtype=np.uint8)]  # the black frame
    shared += [rng.integers(0, 256, (1, H, W, 1), dtype=np.uint8)
               for _ in range(SHARED - 1)]
    rows = []
    uniques = [np.concatenate(
        [rng.integers(0, 256, (1, H, W, 1), dtype=np.uint8)
         for _ in range(UNIQUE)], axis=0) for _ in range(n // 2)]
    for i in range(n):
        u = uniques[i % (n // 2)]  # second half duplicates the first
        vid = np.concatenate(shared + [u], axis=0)
        f = vid.shape[0]
        rows.append((i, "video", vid.tobytes(), ("raw", W, H, 1, None, f)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(32)


def run(spark, media, df_cap):
    from parquetaivectorsearch_spark.operators.multimodal import (
        video_frame_hashes, video_matches)

    fh = video_frame_hashes(media).localCheckpoint(eager=True)
    best, pairs = math.inf, None
    for _ in range(REPS):
        t0 = time.monotonic()
        pairs = video_matches(media, min_containment=0.8, frame_hashes=fh,
                              df_cap=df_cap).count()
        best = min(best, time.monotonic() - t0)
    return best, pairs


def main():
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    out = {}
    for label, n in (("1x", N_BASE), ("10x", 10 * N_BASE)):
        media = corpus(spark, n).localCheckpoint(eager=True)
        for mode, cap in (("uncapped", None), ("capped", 64)):
            t, pairs = run(spark, media, cap)
            out[(label, mode)] = (t, pairs)
            print(f"{label} {mode}: {t:.2f}s pairs={pairs} "
                  f"(true dups = {n // 2})", flush=True)
    for mode in ("uncapped", "capped"):
        a = math.log(out[("10x", mode)][0] / out[("1x", mode)][0]) \
            / math.log(10)
        print(f"alpha({mode}) = {a:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
