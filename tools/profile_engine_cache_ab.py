"""Engine-level interleaved A/B: the expand_frontier candidate cache
(r08 session 2) on vs off, through the REAL steady discovery run_round.
One store is prepared through rounds 1-2, then each measurement runs
round 3 on a fresh copy of that store."""
import os, shutil, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .appName("prof_engine_cache_ab")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import crawlingathome_server_spark.plans.rounds as R
from crawlingathome_server_spark.plans.rounds import CrawlEngine
from crawlingathome_server_spark.sources.checkpoint import CheckpointStore


def pages(lo, hi):
    return spark.range(lo, hi).select(
        F.concat(
            F.lit("http://host"), F.pmod(F.col("id"), F.lit(50_000)),
            F.lit(".example.com/p/"), F.col("id"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id") % 86_400).alias("warc_ts"),
    )


def steady_pages():
    known = pages(2_000_000, 3_960_000)
    fresh = spark.range(20_000_000, 20_040_000).select(
        F.concat(
            F.lit("http://host"), F.lit(50_000) + F.pmod(F.col("id"), F.lit(1_000)),
            F.lit(".example.com/p/"), F.col("id"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id") % 86_400).alias("warc_ts"),
    )
    return known.unionByName(fresh)


def robots_bodies(hosts_df):
    return hosts_df.select(
        "host",
        F.concat(
            F.lit("User-agent: *\nDisallow: /private\nCrawl-delay: 1\nSitemap: http://"),
            F.col("host"), F.lit("/sm.xml\n"),
        ).alias("robots_txt"),
    )


proto = tempfile.mkdtemp(prefix="prof_cacheab_proto", dir="/tmp")
store = CheckpointStore(proto, n_partitions=32)
eng = CrawlEngine(spark, store, seed=5, default_budget=1 << 30, discovery=True)
eng.bootstrap()
eng.run_round(pages(0, 2_000_000), round_epoch=1)
eng.run_round(
    pages(1_000_000, 3_000_000), round_epoch=2,
    robots_fetched=robots_bodies(eng.robots_worklist()),
)

orig_expand = R.expand_frontier


def expand_nocache(*a, **kw):
    kw.pop("round_caches", None)
    return orig_expand(*a, **kw)


fresh_hosts = spark.range(1_000).select(
    F.concat(F.lit("host"), F.lit(50_000) + F.col("id"), F.lit(".example.com")).alias("host")
)


def run(use_cache):
    R.expand_frontier = orig_expand if use_cache else expand_nocache
    d = tempfile.mkdtemp(prefix="prof_cacheab_run", dir="/tmp")
    os.rmdir(d)
    shutil.copytree(proto, d)
    st = CheckpointStore(d, n_partitions=32)
    en = CrawlEngine(spark, st, seed=5, default_budget=1 << 30, discovery=True)
    t0 = time.perf_counter()
    en.run_round(steady_pages(), round_epoch=3,
                 robots_fetched=robots_bodies(fresh_hosts))
    dt = time.perf_counter() - t0
    R.expand_frontier = orig_expand
    shutil.rmtree(d, ignore_errors=True)
    return dt


# warm both
run(False); run(True)
import collections
allv = collections.defaultdict(list)
for it in range(4):
    a = run(False)
    b = run(True)
    allv["nocache"].append(a); allv["cache"].append(b)
    print(f"iter {it}: nocache {a:6.3f}  cache {b:6.3f}  load {os.getloadavg()[0]:.1f}", flush=True)
for k, v in allv.items():
    s = sorted(v)
    print(f"{k}: best {s[0]:.3f}  median {s[len(s)//2]:.3f}")
shutil.rmtree(proto, ignore_errors=True)
spark.stop()
