"""Per-rep GC + steal adjudication for wide-tier scatter (BENCH_NOTES
"r11: wide-tier scatter root-caused"): every wide serve path runs 6
straight reps, each bracketed by JVM GarbageCollectorMXBean collection
time and /proc/stat steal deltas, so a slow rep carries its own
adjudication (GC spike / steal burst / neither = host-side noise).
Run on an idle machine — nothing else concurrent (in-guest contention
is invisible to steal counters).

Usage: python tools/wide_scatter_probe.py"""
import sys, time
from pathlib import Path
_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from parquetaivectorsearch_spark.operators import knn as KNN
from parquetaivectorsearch_spark.operators import pq as PQ

jvm = spark.sparkContext._jvm
mf = jvm.java.lang.management.ManagementFactory

def gc_ms():
    total = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        total += it.next().getCollectionTime()
    return total

def stat():
    f = open("/proc/stat").readline().split()
    vals = [int(x) for x in f[1:]]
    total = sum(vals)
    return total, vals[7]  # total jiffies, steal jiffies

dim = 1536
N = 50_000
def gen(batches):
    for pdf in batches:
        ids = pdf["id"].to_numpy()
        vecs = []
        for i in ids:
            rng = np.random.RandomState(int(i) % (2**31))
            v = rng.randn(dim).astype(np.float32)
            vecs.append(v / np.linalg.norm(v))
        yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

import tempfile
base = tempfile.mkdtemp(prefix="churn2_")
(spark.range(N, numPartitions=32).mapInPandas(gen, "vec_id LONG, embedding ARRAY<FLOAT>")
 .write.mode("overwrite").parquet(f"{base}/corpus"))
corpus = spark.read.parquet(f"{base}/corpus")
query = KNN.query_vector_df(corpus, 0)
queries8 = corpus.filter(F.col("vec_id") < 8).select(
    F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
books = PQ.train_pq(corpus, m=16, k=16, sample_cap=8192)
PQ.pq_encode(corpus, books).write.mode("overwrite").parquet(f"{base}/codes")
codes = spark.read.parquet(f"{base}/codes")
from parquetaivectorsearch_spark.functions.vector import int8_quantize
int8_quantize(corpus).select("vec_id","scale","qvec").write.mode("overwrite").parquet(f"{base}/int8")
quant = spark.read.parquet(f"{base}/int8")
corpus.select("vec_id", F.slice("embedding",1,256).alias("embedding")).write.mode("overwrite").parquet(f"{base}/prefix256")
prefix256 = spark.read.parquet(f"{base}/prefix256")

def fold(): KNN.knn_topk(corpus, query, k=20).write.format("noop").mode("overwrite").save()
def arrow(): KNN.knn_topk_arrow(corpus, query, k=20).write.format("noop").mode("overwrite").save()
def bulk(): KNN.knn_join_bulk(corpus, queries8, k=20).write.format("noop").mode("overwrite").save()
def pq_serve():
    short = PQ.pq_adc_search(codes, books, queries8, shortlist=500)
    PQ.pq_rerank(short, corpus, queries8, k=20).write.format("noop").mode("overwrite").save()
def int8_serve(): KNN.int8_knn_join_bulk(quant, corpus, queries8, k=20, shortlist=500).write.format("noop").mode("overwrite").save()
def matry(): KNN.prefix_rerank_topk(prefix256, corpus, query, k=20, shortlist=500, prefix_dim=256).write.format("noop").mode("overwrite").save()
def maxsim(): KNN.maxsim_topk_arrow(corpus, query, k=20, n_tok=4).write.format("noop").mode("overwrite").save()

for name, fn in (("fold",fold),("arrow",arrow),("bulk",bulk),("pq",pq_serve),
                 ("int8",int8_serve),("matry",matry),("maxsim",maxsim)):
    reps = []
    for i in range(6):
        g0 = gc_ms(); t0_tot, t0_st = stat()
        w0 = time.monotonic(); fn(); wall = time.monotonic()-w0
        g1 = gc_ms(); t1_tot, t1_st = stat()
        steal_pct = 100.0*(t1_st-t0_st)/max(t1_tot-t0_tot,1)
        reps.append((round(wall,2), g1-g0, round(steal_pct,2)))
        print(f"{name} rep{i}: wall={wall:.2f}s gc={g1-g0}ms steal={steal_pct:.2f}%", flush=True)
    print(f"{name}: {reps}", flush=True)
spark.stop()
