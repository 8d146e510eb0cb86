"""SparkSession factory tuned for the engine.

Local-mode defaults mirror the test/bench environment (``local[$SPARK_GRAFT_CPUS]``)
but every knob is the one you would also set on a real cluster:

- AQE on: runtime join-strategy switch, skew-join splitting, partition
  coalescing — the cluster-scale answer to the reference's hand-tuned
  ``MaxDegreeOfParallelism`` (Program.cs:33-37).
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a 1000-executor
  cluster this would be ~2-3× total cores (AQE coalesces the excess).
- Arrow enabled for all pandas-UDF exchange (the batched-amortization idea of
  the reference's BATCHSIZE=10k, Program.cs:16, for free).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_SHIPPED: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Pandas UDFs defined in the package pickle by reference to their module,
    and workers spawned by the JVM do not inherit the driver's sys.path —
    a harness that did ``sys.path.insert(0, repo)`` from another cwd gets
    ModuleNotFoundError at the first UDF. ``sc.addPyFile`` of a zip of the
    package (the cluster deployment story, too) fixes both. Idempotent per
    SparkContext."""
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    import parquetaivectorsearch_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    zpath = os.path.join(tempfile.mkdtemp(prefix="pavs_pkg_"),
                         "parquetaivectorsearch_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, os.path.dirname(pkg_dir)))
    sc.addPyFile(zpath)
    _SHIPPED.add(id(sc))


def get_spark(app_name: str = "parquetaivectorsearch_spark", *, cpus: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # ObjectHashAggregate (collect_list/collect_set/percentile & other
        # TypedImperativeAggregates) silently falls back to SORT-BASED
        # aggregation after 128 distinct keys per partition — a per-
        # partition object sort that measured 10-40× slower on grouped
        # collection aggs (an explode+collect_set shingle stage went 83s
        # at sf0.1 purely from the fallback). 64k keys of small per-key
        # buffers is well within executor memory at our partition sizing;
        # spill safety for pathological key counts is preserved above it.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
                "65536")
        # One BLAS thread per Python worker: with one worker per core, a
        # multi-threaded OpenBLAS inside each (numpy kernels in the UDF
        # paths — KNN matmuls, HNSW/PQ builds) oversubscribes the machine
        # and slows the CPU-bound stages. Standard practice for
        # executor-side numpy; a real cluster sets the same env per
        # executor.
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
