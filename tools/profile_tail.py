"""Decompose the bench-tail queries (sim_knn_cosine, dedup_minhash_lsh)
into stage timings at sf0.1 — VERDICT r06 next #3 profiling aid.

Usage: python tools/profile_tail.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .appName("profile_tail")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def t(label, fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:42s} {best:7.3f} s")
    return best


def mat(df):
    df.write.format("noop").mode("overwrite").save()


emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
print(f"embeddings rows={emb.count()} docs rows={docs.count()}")

# ---- sim_knn_cosine decomposition ----
from crawlingathome_server_spark.operators.similarity import cosine_expr, ivf_topk
from pyspark.sql import Window

e = emb.select(
    "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
).cache()
e.count()

probes = e.filter(F.col("vec_id") < 5).select(
    F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
)
scored = (
    F.broadcast(probes)
    .crossJoin(e)
    .filter(F.col("vec_id") != F.col("probe_id"))
    .select(
        "probe_id",
        F.col("vec_id").alias("cand_id"),
        F.round(cosine_expr(F.col("pv"), F.col("v")), 6).alias("cosine_sim"),
    )
)
w = Window.partitionBy("probe_id").orderBy(F.desc("cosine_sim"), F.asc("cand_id"))
brute = (
    scored.withColumn("rn", F.row_number().over(w))
    .filter(F.col("rn") <= 10)
    .select("probe_id", "cand_id", "cosine_sim")
)
t("knn: brute force only", lambda: mat(brute))

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector

feats = e.select("vec_id", array_to_vector(F.col("v")).alias("features"))
t("knn: KMeans fit (maxIter=1, kmeans||)", lambda: KMeans(k=8, seed=13, maxIter=1).fit(feats))
t(
    "knn: KMeans fit (maxIter=1, random init)",
    lambda: KMeans(k=8, seed=13, maxIter=1, initMode="random").fit(feats),
)

ivf = ivf_topk(
    e,
    e.filter(F.col("vec_id") < 5),
    k=10,
    n_lists=8,
    nprobe=8,
    seed=13,
    vec_col="v",
    round_sim=6,
    max_iter=1,
)
t("knn: full ivf_topk", lambda: mat(ivf))
full = brute.join(
    F.broadcast(ivf.select("probe_id", "cand_id", F.lit(True).alias("__ivf_hit"))),
    ["probe_id", "cand_id"],
    "left",
)
t("knn: brute+ivf join (the full query)", lambda: mat(full))

# ---- dedup_minhash_lsh decomposition ----
from crawlingathome_server_spark.operators.dedup import (
    minhash_dedup,
    minhash_signatures,
)

t("mh: full minhash_dedup md5 (reuse=True)",
  lambda: mat(minhash_dedup(docs, threshold=0.5, mode="md5", reuse=True)))
t("mh: full minhash_dedup md5 (reuse=False)",
  lambda: mat(minhash_dedup(docs, threshold=0.5, mode="md5", reuse=False)))
from crawlingathome_server_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures_expr,
    shingle_hashes_expr,
)
from crawlingathome_server_spark.util import spread

d2 = spread(docs)
t("mh: shingle md5 hashes only", lambda: mat(d2.select("doc_id", shingle_hashes_expr("text", 3, "md5").alias("h"))))
t("mh: shingle xxhash only", lambda: mat(d2.select("doc_id", shingle_hashes_expr("text", 3, "xxhash64").alias("h"))))
sigs = minhash_signatures_expr(d2, hash_mode="md5")
t("mh: signatures md5", lambda: mat(sigs))
t("mh: signatures xxhash", lambda: mat(minhash_signatures_expr(d2, hash_mode="xxhash64")))
t("mh: sigs+banding md5", lambda: mat(lsh_candidate_pairs(sigs, n_bands=16, rows_per_band=4, bucket_mode="fold")))

spark.stop()
