"""Heavy-bucket audit for phash_pairs' chunk blocking (VERDICT r10 #3).

The hazard, one modality over from audio/video: SMOOTH images —
vertically (or horizontally) near-constant content, flat backgrounds,
logos on plain fields — zero out the high-frequency rows of the 8×8
DCT block, so the hash bits for those rows all land below the median
and the corresponding 16-bit CHUNKS collapse to shared values (often
0x0000). Every smooth image then lands in the same chunk buckets even
when their full hashes differ: the candidate self-join goes quadratic
in the smooth-image count while the verified output stays small — cost
without output, exactly audio's pre-cap failure shape.

This script MEASURES it: a planted corpus of vertically-constant
random-stripe images (each row pattern unique → full hashes differ,
high-freq chunks shared) + an equal count of dense random images, at
n and 10n. Reports wall time, candidate counts, and the log-log alpha
for the uncapped join and (when the operator grows one) the capped
join. Per house style the numbers land in SCALING.md either way —
negative results welcome.

Usage: python tools/phash_bucket_audit.py
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

N_BASE = 600          # per class (smooth + dense) at 1×
REPS = 3
H = W = 32


def make_corpus(spark, n_per_class: int):
    from parquetaivectorsearch_spark.operators.multimodal import MEDIA_SCHEMA

    rng = np.random.default_rng(4242)
    rows = []
    for i in range(n_per_class):
        stripe = rng.integers(0, 256, (1, W, 3), dtype=np.uint8)
        img = np.tile(stripe, (H, 1, 1))            # vertically constant
        rows.append((i, "image", img.tobytes(), ("raw", W, H, 3, None, None)))
    for i in range(n_per_class):
        img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        rows.append((n_per_class + i, "image", img.tobytes(),
                     ("raw", W, H, 3, None, None)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(32)


def run(spark, media, **kw):
    from parquetaivectorsearch_spark.operators.multimodal import (
        phash_images, phash_pairs)

    hashes = phash_images(media).localCheckpoint(eager=True)
    best = math.inf
    n_cand = None
    for _ in range(REPS):
        t0 = time.monotonic()
        n_cand = phash_pairs(media, max_hamming=None, hashes=hashes,
                             **kw).count()
        best = min(best, time.monotonic() - t0)
    n_dup = phash_pairs(media, max_hamming=6, hashes=hashes, **kw).count()
    return best, n_cand, n_dup


def main():
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import inspect

    from parquetaivectorsearch_spark.operators import multimodal as MM
    has_cap = "df_cap" in inspect.signature(MM.phash_pairs).parameters

    out = {}
    for label, n in (("1x", N_BASE), ("10x", 10 * N_BASE)):
        media = make_corpus(spark, n).localCheckpoint(eager=True)
        t, cand, dup = run(spark, media)
        out[(label, "uncapped")] = (t, cand, dup)
        print(f"{label} uncapped: {t:.2f}s  candidates={cand}  dups(h<=6)={dup}",
              flush=True)
        if has_cap:
            t, cand, dup = run(spark, media, df_cap=64)
            out[(label, "capped")] = (t, cand, dup)
            print(f"{label} capped:   {t:.2f}s  candidates={cand}  "
                  f"dups(h<=6)={dup}", flush=True)

    for mode in ("uncapped", "capped"):
        if (("1x", mode) in out) and (("10x", mode) in out):
            a = math.log(out[("10x", mode)][0] / out[("1x", mode)][0]) \
                / math.log(10)
            print(f"alpha({mode}) = {a:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
