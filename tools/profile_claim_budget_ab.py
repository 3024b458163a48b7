"""r08 session-2 evidence tool: interleaved A/B of the budgeted
(column-budget) claim stage inside the steady discovery expand_frontier.

Four variants, alternated per iteration in ONE process so box noise
hits all of them:

  RANK  nocache  — the shipped claim path without the candidate cache
                   (pre-session-2 behavior): narrow two-phase rank +
                   winner→payload join-back, each consumer re-running
                   the post-exchange candidate work (notably the
                   seen-filter cogroup's Python pass).
  RANK  cache    — the shipped behavior: expand_frontier pins the
                   post-probe candidate set (round_caches) so both
                   claim consumers read the cache. ACCEPTED (r08 s2).
  SPLIT nocache  — a host-level count-split (hosts whose candidate
                   count ≤ min budget bypass the rank + join-back
                   entirely; only over-budget hosts' rows rank).
  SPLIT cache    — the split over the cached candidate set.

Measured verdict (committed in OPTIMIZATION_r08.md): the CACHE is the
win; the split is exactly output-equivalent (asserted below) but
NEGATIVE on time — without the cache its extra plan consumers re-run
the probe cogroup (2x slower), and with the cache its stats pass +
anti/semi joins cost more than the two narrow sorts they remove.
"""
import collections
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .appName("profile_claim_budget_ab")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import crawlingathome_server_spark.plans.rounds as R
from crawlingathome_server_spark.operators import claim as claim_op, urlseen
from crawlingathome_server_spark.operators.claim import (
    UNBOUNDED_BUDGET,
    _ranked_narrow,
    open_jobs,
    order_key,
    seeded_hash64,
)
from crawlingathome_server_spark.plans.rounds import CrawlEngine, expand_frontier
from crawlingathome_server_spark.sources.checkpoint import CheckpointStore


def pages(lo, hi):
    return spark.range(lo, hi).select(
        F.concat(
            F.lit("http://host"), F.pmod(F.col("id"), F.lit(50_000)),
            F.lit(".example.com/p/"), F.col("id"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id") % 86_400).alias(
            "warc_ts"
        ),
    )


def steady_pages():
    known = pages(2_000_000, 3_960_000)
    fresh = spark.range(20_000_000, 20_040_000).select(
        F.concat(
            F.lit("http://host"), F.lit(50_000) + F.pmod(F.col("id"), F.lit(1_000)),
            F.lit(".example.com/p/"), F.col("id"),
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
            F.lit(
                "User-agent: *\nDisallow: /private\nCrawl-delay: 1\n"
                "Sitemap: http://"
            ),
            F.col("host"),
            F.lit("/sm.xml\n"),
        ).alias("robots_txt"),
    )


root = tempfile.mkdtemp(prefix="prof_claimab", dir="/tmp")
store = CheckpointStore(root, n_partitions=32)
eng = CrawlEngine(spark, store, seed=5, default_budget=1 << 30, discovery=True)
eng.bootstrap()
eng.run_round(pages(0, 2_000_000), round_epoch=1)
eng.run_round(
    pages(1_000_000, 3_000_000),
    round_epoch=2,
    robots_fetched=robots_bodies(eng.robots_worklist()),
)

man = store.read_manifest(store.latest_snapshot_id())
params = man["counters"]["urlseen_params"]
flt = store.read(spark, urlseen.FILTER_TABLE).cache()
flt.count()
dim = store.read(spark, "robots_dim").cache()
dim.count()
SP = steady_pages()
FINAL = ("url", "canon_url", "host", "url_hash", "priority", "order_key", "budget")

rank_claim = claim_op.claim_batch  # the shipped implementation


def split_claim(frontier, robots=None, *, seed=0, stage="cpu", default_budget=4,
                salt_buckets=8, host_col="host", use_oracle_hash=False,
                with_payload=True, robots_broadcast=True, budget_col=None):
    """The tried-and-reverted count-split, kept here verbatim for
    re-measurement. Exactness: a host whose candidate count is <= its
    smallest per-row budget keeps EVERY row (each rank <= count <=
    min(budget) <= that row's budget); other hosts route whole-host to
    the shipped two-phase rank, so ranks see the full partition."""
    cand = frontier.filter(open_jobs(frontier, stage))
    if budget_col is None:
        return rank_claim(
            frontier, robots, seed=seed, stage=stage,
            default_budget=default_budget, salt_buckets=salt_buckets,
            host_col=host_col, use_oracle_hash=use_oracle_hash,
            with_payload=with_payload, robots_broadcast=robots_broadcast,
        )
    has_hk = "host_key" in cand.columns
    aug = (
        cand if has_hk else cand.withColumn("host_key", seeded_hash64(F.col(host_col)))
    )
    budget_expr = F.coalesce(F.col(budget_col), F.lit(default_budget))
    stats = aug.groupBy("host_key").agg(
        F.count(F.lit(1)).alias("__n"), F.min(budget_expr).alias("__bmin")
    )
    hot_hosts = stats.filter(F.col("__n") > F.col("__bmin")).select("host_key")
    cold = aug.join(hot_hosts, on="host_key", how="left_anti")
    hot = aug.join(hot_hosts, on="host_key", how="left_semi")
    ok = order_key(seed, use_oracle_hash)
    cold_out = cold.withColumn("order_key", ok).withColumn("budget", budget_expr)
    hot_winners = _ranked_narrow(
        hot, None, seed=seed, default_budget=default_budget,
        salt_buckets=salt_buckets, host_col=host_col,
        use_oracle_hash=use_oracle_hash, budget_col=budget_col,
    ).drop("host_key")
    payload_cols = [
        c for c in frontier.columns
        if c not in ("number", "priority") and c != budget_col
    ]
    out_cols = [c for c in frontier.columns if c != budget_col]
    if not with_payload or not payload_cols:
        sel = ("number", "priority", "order_key", "budget")
        return cold_out.select(*sel).unionByName(hot_winners.select(*sel))
    hot_out = hot_winners.join(
        hot.select("number", *payload_cols), on="number", how="inner"
    )
    final = (*out_cols, "order_key", "budget")
    return cold_out.select(*final).unionByName(hot_out.select(*final))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def run(claim_impl, use_cache):
    claim_op.claim_batch = claim_impl
    R.claim_op.claim_batch = claim_impl
    caches = [] if use_cache else None
    t0 = time.perf_counter()
    out = expand_frontier(
        SP, dim, seen_filter=(flt, params), seed=8,
        default_budget=1 << 30, round_caches=caches,
    ).select(*FINAL)
    noop(out)
    dt = time.perf_counter() - t0
    for c in caches or []:
        c.unpersist()
    claim_op.claim_batch = rank_claim
    R.claim_op.claim_batch = rank_claim
    return dt


VARIANTS = [
    ("RANK  nocache", rank_claim, False),
    ("RANK  cache  ", rank_claim, True),
    ("SPLIT nocache", split_claim, False),
    ("SPLIT cache  ", split_claim, True),
]

for name, impl, uc in VARIANTS:  # warm every plan once
    run(impl, uc)

best = collections.defaultdict(lambda: 9e9)
for it in range(3):
    line = f"iter {it}: "
    for name, impl, uc in VARIANTS:
        dt = run(impl, uc)
        best[name] = min(best[name], dt)
        line += f"[{name.strip()}] {dt:6.3f}  "
    print(line, flush=True)
print("--- best-of-3 ---")
for name, _, _ in VARIANTS:
    print(f"{name} {best[name]:6.3f} s")

# output-equality gate between the shipped rank path and the split
claim_op.claim_batch = split_claim
R.claim_op.claim_batch = split_claim
split_rows = expand_frontier(
    SP, dim, seen_filter=(flt, params), seed=8, default_budget=1 << 30
).select(*FINAL)
claim_op.claim_batch = rank_claim
R.claim_op.claim_batch = rank_claim
rank_rows = expand_frontier(
    SP, dim, seen_filter=(flt, params), seed=8, default_budget=1 << 30
).select(*FINAL)
diff = rank_rows.exceptAll(split_rows).count() + split_rows.exceptAll(rank_rows).count()
print("row diff RANK vs SPLIT:", diff)
assert diff == 0
shutil.rmtree(root, ignore_errors=True)
spark.stop()
