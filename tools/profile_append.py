"""Micro-repro: why does a 1k-row Append onto a 50k-row table cost
seconds? Times each phase of the store's Append path (r07)."""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .appName("profile_append")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from crawlingathome_server_spark.functions import robots as rb
from crawlingathome_server_spark.sources.checkpoint import Append, CheckpointStore

root = tempfile.mkdtemp(prefix="prof_append", dir="/tmp")
store = CheckpointStore(root, n_partitions=32)

hosts = spark.range(50_000).select(
    F.concat(F.lit("host"), F.col("id"), F.lit(".example.com")).alias("host")
)
bodies = hosts.select(
    "host",
    F.concat(
        F.lit("User-agent: *\nDisallow: /private\nCrawl-delay: 1\nSitemap: http://"),
        F.col("host"),
        F.lit("/sm.xml\n"),
    ).alias("robots_txt"),
)
dim = rb.robots_table(bodies, agent="*", round_seconds=30.0)
t0 = time.perf_counter()
store.commit({"robots_dim": dim}, seed=1, round_epoch=0)
print(f"full 50k dim commit: {time.perf_counter()-t0:.3f} s", flush=True)

fresh = spark.range(50_000, 51_000).select(
    F.concat(F.lit("host"), F.col("id"), F.lit(".example.com")).alias("host")
)
fresh_bodies = fresh.select(
    "host",
    F.concat(
        F.lit("User-agent: *\nDisallow: /private\nCrawl-delay: 1\nSitemap: http://"),
        F.col("host"),
        F.lit("/sm.xml\n"),
    ).alias("robots_txt"),
)
new_dim = rb.robots_table(fresh_bodies, agent="*", round_seconds=30.0).cache()
new_dim.count()

read_dim = store.read(spark, "robots_dim")
t0 = time.perf_counter()
store.commit(
    {"robots_dim": read_dim.unionByName(new_dim)},
    seed=1,
    round_epoch=1,
    deltas={"robots_dim": Append(new_dim, remove_keys=Append.SAME)},
)
print(f"1k Append commit (cached delta): {time.perf_counter()-t0:.3f} s", flush=True)
print("  table secs:", store.last_commit_table_secs, flush=True)

# phase timing of the same shapes
t0 = time.perf_counter()
ch = (
    new_dim.select(F.xxhash64(F.col("host"), F.lit(0)).alias("h"))
    .select(F.pmod(F.col("h"), F.lit(32)).alias("b"))
    .distinct()
    .collect()
)
print(f"  phase changed-buckets collect: {time.perf_counter()-t0:.3f} s", flush=True)

snap = store.latest_snapshot_id()
m = store.read_manifest(snap)["tables"]["robots_dim"]
paths = [p["path"] for p in m["partitions"].values() if p["path"]]
t0 = time.perf_counter()
old = spark.read.schema(read_dim.schema).parquet(*paths)
rk = new_dim.select("host").dropDuplicates(["host"])
content = old.join(rk, on="host", how="left_anti").unionByName(new_dim)
out = os.path.join(root, "phase_write")
content.withColumn(
    "__part", F.pmod(F.xxhash64(F.col("host"), F.lit(0)), F.lit(32))
).write.mode("overwrite").partitionBy("__part").parquet(out)
print(f"  phase read+antijoin+write: {time.perf_counter()-t0:.3f} s", flush=True)

t0 = time.perf_counter()
n = spark.read.parquet(out).groupBy("__part").count().collect()
print(f"  phase written-counts: {time.perf_counter()-t0:.3f} s", flush=True)

nfiles = sum(len(fs) for _, _, fs in os.walk(out))
print(f"  files written: {nfiles}", flush=True)
shutil.rmtree(root, ignore_errors=True)
spark.stop()
