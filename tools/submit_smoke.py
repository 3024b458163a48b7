"""spark-submit smoke job — the north rule's literal deployment shape.

Run (no repo on sys.path; the engine ships ONLY via --py-files):

    python tools/make_pyfiles.py
    /opt/spark/bin/spark-submit --master local[8] \
        --py-files dist/crawlingathome_server_spark.zip \
        tools/submit_smoke.py /tmp/submit_smoke_store

The job drives one real crawl round end to end — synthetic pages →
expand_frontier (canonicalize → dedup → seen-probe → politeness claim) →
seen-set delta commit — then RESUMES from the store in the same process
and asserts round-2 determinism, printing one JSON line. Everything is
imported from the zip, exactly how a cluster executor would see it.
"""

from __future__ import annotations

import json
import shutil
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/submit_smoke_store"
    shutil.rmtree(root, ignore_errors=True)
    spark = SparkSession.builder.appName("submit_smoke").getOrCreate()

    # imports resolve from the --py-files zip, not a checkout
    from crawlingathome_server_spark.plans.rounds import CrawlEngine
    from crawlingathome_server_spark.sources.checkpoint import CheckpointStore

    def pages(lo: int, hi: int):
        return spark.range(lo, hi).select(
            F.concat(
                F.lit("http://host"),
                F.pmod(F.col("id"), F.lit(500)),
                F.lit(".example.com/p/"),
                F.col("id"),
            ).alias("url"),
            F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id")).alias("warc_ts"),
        )

    store = CheckpointStore(root, n_partitions=8)
    engine = CrawlEngine(spark, store, seed=11, default_budget=1 << 20)
    engine.bootstrap()
    n1 = engine.run_round(pages(0, 20_000), round_epoch=1).count()

    # resume: a FRESH engine over the same store must exclude round-1 urls
    engine2 = CrawlEngine(
        spark, CheckpointStore(root, n_partitions=8), seed=11, default_budget=1 << 20
    )
    n_overlap = engine2.run_round(pages(0, 20_000), round_epoch=2).count()
    n2 = engine2.run_round(pages(20_000, 30_000), round_epoch=3).count()
    counters = store.read_manifest(store.latest_snapshot_id())["counters"]

    # round 3 may skip a few genuinely-new urls: the seen probe is a
    # bloom filter (fpr=0.01 default) — false positives drop candidates,
    # never re-crawl seen ones. Bound the loss at 2×fpr.
    ok = n1 == 20_000 and n_overlap == 0 and 9_800 <= n2 <= 10_000
    print(
        json.dumps(
            {
                "smoke": "spark-submit --py-files",
                "ok": ok,
                "round1_claimed": n1,
                "resumed_overlap_claimed": n_overlap,
                "round3_claimed": n2,
                "n_seen": counters["n_seen"],
            }
        )
    )
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
