"""Isolate the steady-state discovery round's overhead vs the plain
crawl round (r07). Sets up the bench scenario (round 1 = 2M cold start,
round 2 = 1M new + 50k robots ingested), then times round-3 variants.

Usage: python tools/profile_steady.py
"""
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
    .appName("profile_steady")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from crawlingathome_server_spark.plans.rounds import CrawlEngine
from crawlingathome_server_spark.sources.checkpoint import CheckpointStore


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


def setup_disc():
    root = tempfile.mkdtemp(prefix="prof_steady", dir="/tmp")
    store = CheckpointStore(root, n_partitions=32)
    eng = CrawlEngine(spark, store, seed=5, default_budget=1 << 30, discovery=True)
    eng.bootstrap()
    eng.run_round(pages(0, 2_000_000), round_epoch=1)
    eng.run_round(
        pages(1_000_000, 3_000_000),
        round_epoch=2,
        robots_fetched=robots_bodies(eng.robots_worklist()),
    )
    return root, store, eng


def run(label, fn):
    t0 = time.perf_counter()
    fn()
    print(f"{label:56s} {time.perf_counter() - t0:7.3f} s", flush=True)


fresh_hosts = spark.range(1_000).select(
    F.concat(F.lit("host"), F.lit(50_000) + F.col("id"), F.lit(".example.com")).alias(
        "host"
    )
)

# V3 baseline: plain engine (discovery=False), same round-3 pages
root_p = tempfile.mkdtemp(prefix="prof_plain", dir="/tmp")
store_p = CheckpointStore(root_p, n_partitions=32)
eng_p = CrawlEngine(spark, store_p, seed=5, default_budget=1 << 30)
eng_p.bootstrap()
eng_p.run_round(pages(0, 2_000_000), round_epoch=1)
eng_p.run_round(pages(1_000_000, 3_000_000), round_epoch=2)
run("V3 plain engine round-3 (steady pages)", lambda: eng_p.run_round(steady_pages(), round_epoch=3))
shutil.rmtree(root_p, ignore_errors=True)

# V2: discovery engine, NO ingest this round (dim exists from round 2)
root2, store2, eng2 = setup_disc()
run("V2 discovery round-3, robots_fetched=None", lambda: eng2.run_round(steady_pages(), round_epoch=3))
shutil.rmtree(root2, ignore_errors=True)

# V1: the bench steady round (1k bodies ingested)
root1, store1, eng1 = setup_disc()
run(
    "V1 discovery round-3, 1k bodies (bench steady row)",
    lambda: eng1.run_round(
        steady_pages(), round_epoch=3, robots_fetched=robots_bodies(fresh_hosts)
    ),
)
shutil.rmtree(root1, ignore_errors=True)

spark.stop()
