"""Small-file compaction — table maintenance for the 100 TB posture.

Every incremental writer in this engine (streaming micro-batches, IVF
list partitions, per-round dedup outputs) accumulates small parquet files;
at scale, scan throughput dies on open/footer overhead long before bytes
do. Compaction rewrites a table toward a target in-file size, preserving
the partition layout when asked.

This is the knob Spark itself doesn't provide (no OPTIMIZE without a
table format): size estimation from the FileSystem, repartition to
ceil(bytes/target), atomic swap via rename.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(total_bytes, n_files) for a parquet directory, via the Hadoop FS API
    (works for DFS paths, not just local)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    total, n = 0, 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet"):
            total += f.getLen()
            n += 1
    return total, n


def compact_parquet(spark: SparkSession, path: str,
                    target_file_bytes: int = 128 * 1024 * 1024,
                    partition_by: str | None = None) -> tuple[int, int]:
    """Rewrite a parquet directory into ceil(total/target) files (per
    partition dir when `partition_by` is given). Returns (files_before,
    files_after). Writes to a sibling temp dir, then swaps via two renames.

    NOT atomic (plain filesystems have no multi-path transaction): a crash
    between the two renames leaves no data at `path` with the original
    stranded at `path__old`; on a failed second rename this function
    restores `path__old` back to `path` before raising. Readers racing the
    swap can observe a missing directory for the rename window. For
    transactional swaps use a table format (Delta/Iceberg) — this operator
    is the no-table-format fallback."""
    total, before = dir_stats(spark, path)
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(path)

    tmp = path.rstrip("/") + "__compacting"
    if partition_by is not None:
        # one write task per partition value bucket; files per dir ≈
        # n_out / n_partitions on average
        df.repartition(n_out, partition_by).write.mode("overwrite") \
            .partitionBy(partition_by).parquet(tmp)
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(tmp)

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    old = path.rstrip("/") + "__old"
    hpath = jvm.org.apache.hadoop.fs.Path
    fs.rename(hpath(path), hpath(old))
    try:
        if not fs.rename(hpath(tmp), hpath(path)):
            raise IOError(f"rename {tmp} -> {path} returned false")
    except Exception:
        # best-effort rollback: put the original back before surfacing
        fs.rename(hpath(old), hpath(path))
        raise
    fs.delete(hpath(old), True)
    _, after = dir_stats(spark, path)
    return before, after
