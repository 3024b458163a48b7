"""Per-stage timing of the steady discovery round via monkeypatched
engine/store methods (r07 follow-up to profile_steady.py)."""
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
    .appName("profile_steady2")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from crawlingathome_server_spark.plans.rounds import CrawlEngine
from crawlingathome_server_spark.sources.checkpoint import CheckpointStore

TIMES = {}


def wrap(cls, name):
    orig = getattr(cls, name)

    def timed(*a, **kw):
        t0 = time.perf_counter()
        out = orig(*a, **kw)
        TIMES[name] = TIMES.get(name, 0.0) + time.perf_counter() - t0
        return out

    setattr(cls, name, timed)


def pages(lo, hi):
    return spark.range(lo, hi).select(
        F.concat(
            F.lit("http://host"),
            F.pmod(F.col("id"), F.lit(50_000)),
            F.lit(".example.com/p/"),
            F.col("id"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id") % 86_400).alias(
            "warc_ts"
        ),
    )


def steady_pages():
    known = pages(2_000_000, 3_960_000)
    fresh = spark.range(20_000_000, 20_040_000).select(
        F.concat(
            F.lit("http://host"),
            F.lit(50_000) + F.pmod(F.col("id"), F.lit(1_000)),
            F.lit(".example.com/p/"),
            F.col("id"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id") % 86_400).alias(
            "warc_ts"
        ),
    )
    return known.unionByName(fresh)


def robots_bodies(hosts_df):
    return hosts_df.select(
        "host",
        F.concat(
            F.lit("User-agent: *\nDisallow: /private\nCrawl-delay: 1\nSitemap: http://"),
            F.col("host"),
            F.lit("/sm.xml\n"),
        ).alias("robots_txt"),
    )


# plain engine baseline with the same telemetry
root_p = tempfile.mkdtemp(prefix="prof_plain2", dir="/tmp")
store_p = CheckpointStore(root_p, n_partitions=32)
eng_p = CrawlEngine(spark, store_p, seed=5, default_budget=1 << 30)
eng_p.bootstrap()
eng_p.run_round(pages(0, 2_000_000), round_epoch=1)
eng_p.run_round(pages(1_000_000, 3_000_000), round_epoch=2)
t0 = time.perf_counter()
eng_p.run_round(steady_pages(), round_epoch=3)
tp = time.perf_counter() - t0
print(f"plain round 3: {tp:.3f} s")
for name, sec in sorted(store_p.last_commit_table_secs.items(), key=lambda kv: -kv[1]):
    print(f"    commit[{name:16s}] {sec:7.3f} s")
shutil.rmtree(root_p, ignore_errors=True)

root = tempfile.mkdtemp(prefix="prof_steady2", dir="/tmp")
store = CheckpointStore(root, n_partitions=32)
eng = CrawlEngine(spark, store, seed=5, default_budget=1 << 30, discovery=True)
eng.bootstrap()
eng.run_round(pages(0, 2_000_000), round_epoch=1)
eng.run_round(
    pages(1_000_000, 3_000_000),
    round_epoch=2,
    robots_fetched=robots_bodies(eng.robots_worklist()),
)

wrap(CrawlEngine, "_discovery_ingest")
wrap(CrawlEngine, "_discovery_finish")
wrap(CheckpointStore, "commit")

fresh_hosts = spark.range(1_000).select(
    F.concat(F.lit("host"), F.lit(50_000) + F.col("id"), F.lit(".example.com")).alias(
        "host"
    )
)
t0 = time.perf_counter()
eng.run_round(
    steady_pages(), round_epoch=3, robots_fetched=robots_bodies(fresh_hosts)
)
total = time.perf_counter() - t0
print(f"total round 3: {total:.3f} s")
for k, v in TIMES.items():
    print(f"  {k:24s} {v:7.3f} s")
print(f"  {'claim+filter+rest':24s} {total - sum(TIMES.values()):7.3f} s")
for name, sec in sorted(store.last_commit_table_secs.items(), key=lambda kv: -kv[1]):
    print(f"    commit[{name:16s}] {sec:7.3f} s")
shutil.rmtree(root, ignore_errors=True)
spark.stop()
