"""Corpus-dedup crossover bench: exact anti-join vs filter-first probe.

The curate pipeline's cross-round dedup (rounds.py `_curate_pages`) has
two exact paths:

- ``exact``: left-anti join of the round's docs against the FULL corpus
  fingerprint column — Spark shuffles+sorts the corpus side every round
  (it is far above any broadcast threshold), so per-round cost grows
  O(corpus) in SHUFFLED bytes;
- ``probe`` (r07): probe the persisted ``corpus_fp_filter`` (no false
  negatives → probe-negatives are definitely new), then confirm only the
  positives against a column-pruned bucket point-read of the corpus,
  with the positives BROADCAST both ways. The corpus is scanned (one
  int64 column) but never shuffled, never sorted; shuffle volume is
  O(round docs) for the probe cogroup only. The remaining O(corpus)
  scan term is the same key→rowgroup-skipping limitation documented in
  NOTES.md for the frontier point-read — below ~10^9 rows/bucket the
  pruned scan is not the bottleneck.

Both paths return identical row sets (pytest
``test_curate_corpus_filter_false_positives_confirmed`` proves the
false-positive confirm); this tool measures where the probe's fixed
cost (a Python cogroup crossing over the round's 300k fingerprints)
pays for itself, justifying the ``curate_filter_min_corpus`` default.

Protocol: for each corpus size N, seed FOUR fresh stores identically
(direct commit of a synthesized corpus + its filter — the same
DataFrame-native expressions `_curate_pages` uses, so fingerprints
match real extraction), then time one real ``CrawlEngine.run_round``
(300k pages, 10% cross-round dups) per store, modes interleaved
probe/exact/probe/exact, best-of-2 per mode. Everything timed is the
production code path — only ``curate_filter_min_corpus`` differs.

Output: BENCH/curate_filter.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SIZES = tuple(
    int(s)
    for s in os.environ.get(
        "CURATE_FILTER_BENCH_SIZES", "250000,1000000,4000000,8000000"
    ).split(",")
)
ROUND_PAGES = 300_000
ROUND_DUPS = 30_000

FILLER = "the quick brown fox jumps over the lazy dog near the river bank "


def pages_expr(spark, lo: int, hi: int):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.concat(
            F.lit("http://h"),
            F.pmod(F.col("id"), F.lit(997)),
            F.lit(".example.com/dir/page"),
            F.col("id"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id") % 86_400).alias(
            "warc_ts"
        ),
        F.concat(
            F.lit("<html><head><title>t"),
            F.col("id"),
            F.lit("</title></head><body><p>"),
            F.repeat(F.lit(FILLER), (F.pmod(F.col("id"), F.lit(2)) + 1).cast("int")),
            F.lit("doc "),
            F.col("id"),
            F.lit("</p></body></html>"),
        ).alias("html"),
    )


def seed_store(spark, root: str, n_corpus: int):
    """Bootstrap + direct commit of an n_corpus-doc corpus and its
    filter, with the exact counters a curate round would have left."""
    from pyspark.sql import functions as F

    from crawlingathome_server_spark.functions import text as tx
    from crawlingathome_server_spark.functions.urls import canonicalize_url_expr
    from crawlingathome_server_spark.plans.rounds import CrawlEngine
    from crawlingathome_server_spark.sources.checkpoint import CheckpointStore

    store = CheckpointStore(root, n_partitions=32)
    eng = CrawlEngine(
        spark, store, seed=11, default_budget=1 << 30,
        curate=True, curate_min_chars=50,
    )
    eng.bootstrap()
    # the same derivations _curate_pages applies, so a re-crawled page's
    # fingerprint in the timed round matches the seeded corpus row's
    corpus = (
        pages_expr(spark, 0, n_corpus)
        .select(
            canonicalize_url_expr(F.col("url")).alias("canon_url"),
            tx.extract_text_jvm(F.col("html")).alias("text"),
        )
        .select(
            F.xxhash64("text").alias("fingerprint"),
            "canon_url",
            "text",
            tx.lang_id(F.col("text")).alias("lang"),
            tx.quality_score(F.col("text")).alias("quality"),
            tx.token_count_ws(F.col("text")).alias("n_tokens"),
            F.lit(1).cast("long").alias("curated_epoch"),
        )
    )
    capacity = 2 * n_corpus
    flt, params = eng._build_filter(
        corpus.select("fingerprint"), capacity, key_col="fingerprint"
    )
    store.commit(
        {CrawlEngine.CORPUS: corpus, CrawlEngine.CORPUS_FILTER: flt},
        seed=11,
        round_epoch=1,
        counters={
            "n_seen": 0,
            "crawl_capacity": 0,
            "n_corpus_total": n_corpus,
            "corpus_params": params,
            "corpus_capacity": capacity,
        },
    )
    return store


def main() -> None:
    from crawlingathome_server_spark.plans.rounds import CrawlEngine
    from crawlingathome_server_spark.session import get_spark

    spark = get_spark("curate_filter_bench", shuffle_partitions=32)
    results: dict = {
        "protocol": (
            "per (N, mode): 2 fresh identically-seeded stores, one timed "
            "run_round(300k pages, 30k cross-round dups) each, modes "
            "interleaved, best-of-2; only curate_filter_min_corpus differs"
        ),
        "round_pages": ROUND_PAGES,
        "round_dups": ROUND_DUPS,
        "sizes": {},
        "loadavg_1m_start": round(os.getloadavg()[0], 2),
    }
    roots: list[str] = []
    try:
        for n in SIZES:
            attempts: dict[str, list[float]] = {"probe": [], "exact": []}
            plan = ["probe", "exact", "probe", "exact"]
            for mode in plan:
                root = tempfile.mkdtemp(prefix="curate_flt_bench", dir="/tmp")
                roots.append(root)
                store = seed_store(spark, root, n)
                eng = CrawlEngine(
                    spark, store, seed=11, default_budget=1 << 30,
                    curate=True, curate_min_chars=50,
                    curate_filter_min_corpus=(0 if mode == "probe" else 10**15),
                )
                pages = pages_expr(
                    spark, n - ROUND_DUPS, n - ROUND_DUPS + ROUND_PAGES
                )
                t0 = time.perf_counter()
                eng.run_round(pages, round_epoch=2)
                attempts[mode].append(round(time.perf_counter() - t0, 3))
                c = store.read_manifest(store.latest_snapshot_id())["counters"]
                assert c["n_curated"] == ROUND_PAGES - ROUND_DUPS, (mode, n, c)
                assert c["n_corpus_total"] == n + ROUND_PAGES - ROUND_DUPS
                shutil.rmtree(root, ignore_errors=True)
                roots.pop()
            probe_s, exact_s = min(attempts["probe"]), min(attempts["exact"])
            results["sizes"][str(n)] = {
                "probe_s": probe_s,
                "exact_s": exact_s,
                "probe_attempts": attempts["probe"],
                "exact_attempts": attempts["exact"],
                "speedup": round(exact_s / probe_s, 3),
            }
            print(f"N={n}: probe {probe_s}s exact {exact_s}s", flush=True)
    finally:
        for root in roots:
            shutil.rmtree(root, ignore_errors=True)
    results["loadavg_1m_end"] = round(os.getloadavg()[0], 2)
    out = os.path.join(os.path.dirname(__file__), "..", "BENCH", "curate_filter.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["sizes"]))


if __name__ == "__main__":
    main()
