"""Decompose the steady-state discovery round's recurring cost (r07).

The discovery bench's round-over-plain delta comes from the per-round
politeness machinery, not the O(fetched) ingestion: this script times
the 2M-candidate expand_frontier under each robots-dim configuration so
the rules join, the column-budget claim, and the dim scan separate.

Usage: python tools/profile_discovery.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .appName("profile_discovery")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from crawlingathome_server_spark.functions import robots as rb
from crawlingathome_server_spark.plans.rounds import expand_frontier


def t(label, fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:52s} {best:7.3f} s", flush=True)
    return best


def mat(df):
    df.write.format("noop").mode("overwrite").save()


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
dim_mem = rb.robots_table(bodies, agent="*", round_seconds=30.0).cache()
dim_mem.count()
print("dim cols:", dim_mem.columns, flush=True)

# persist the dim like the store does, then read back (parquet scan cost)
dim_path = "/tmp/profile_disc_dim.parquet"
dim_mem.write.mode("overwrite").parquet(dim_path)
dim_pq = spark.read.parquet(dim_path)

P = pages(1_000_000, 3_000_000)

t("A plain: robots=None (literal budget, WGL)", lambda: mat(expand_frontier(P, None, default_budget=1 << 30)))

budget_only = dim_pq.select("host", "max_claims_per_round")
t("C budget-only dim (column-budget claim, no rules)", lambda: mat(expand_frontier(P, budget_only, default_budget=1 << 30)))

t("D full dim (rules + column budget)", lambda: mat(expand_frontier(P, dim_pq, default_budget=1 << 30)))

t("E full dim CACHED in memory", lambda: mat(expand_frontier(P, dim_mem, default_budget=1 << 30)))

# how big is the budget actually? crawl-delay 1s, round 30s → 30/host.
bud = dim_pq.select(F.min("max_claims_per_round"), F.max("max_claims_per_round")).first()
print("budget min/max:", tuple(bud), flush=True)

spark.stop()
