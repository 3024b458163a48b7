"""Headline benchmark. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query timings are best-of-2 (the box hosts noisy CPU neighbors; the
min-of-N protocol is documented in BENCH/BASELINE.md).

Runs on ``local[$SPARK_GRAFT_CPUS]`` over ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1). The headline metric is the total wall
time; ``urls_scheduled_per_sec`` reports the flagship frontier-expansion
throughput (the BASELINE.json metric). Scaling efficiency across two
parallelism levels is measured by tools/scaling_bench.py → BENCH/.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _materialize(df) -> int:
    """Force full execution without collecting rows to the driver."""
    return df.count()


def run_bench(spark, sf_dir: str) -> dict:
    import __spark_entry__ as se
    from pyspark.sql import functions as F

    from crawlingathome_server_spark.plans.rounds import expand_frontier

    qs = se.queries()
    headline = [
        "j1_fk_prefetch_join",
        "a1_dashboard_counts",
        "a3_grouped_sum",
        "o1_topk_per_type",
        "o4_seeded_hash_claim",
        "d1_dedup_first_wins",
        "j5_leaderboard_upsert",
        "t_lang_id",
        "t_quality_features",
        "dedup_exact_hash",
        "sim_knn_cosine",
        "sim_ann_lsh",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "a5_eta_estimate",
        "t_token_count_bpeish",
    ]
    # warm the session: file listing, codegen, broadcast machinery — so the
    # first headline query doesn't absorb JVM startup
    for t in ("orders", "customer", "events", "documents", "embeddings", "lineitem"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    def best_of(fn, n: int = 2) -> float:
        """min-of-N per query: the box hosts noisy CPU neighbors (see
        BENCH/BASELINE.md), so single-shot timings confound the engine
        with whoever else was running."""
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    timings: dict[str, float] = {}
    for name in headline:
        timings[name] = best_of(lambda: _materialize(qs[name](spark, sf_dir)))

    # the at-scale defaults of the two dedup ops (xxhash64 hash family);
    # the driver queries above run the md5 oracle-parity variants
    from crawlingathome_server_spark.operators.dedup import (
        minhash_dedup,
        simhash_candidates,
    )

    docs_sf = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timings["dedup_minhash_lsh_expr"] = best_of(
        lambda: _materialize(minhash_dedup(docs_sf, threshold=0.5, mode="expr"))
    )
    timings["dedup_simhash_expr"] = best_of(
        lambda: _materialize(simhash_candidates(docs_sf, max_hamming=3))
    )

    # flagship: frontier expansion over a pages-shaped projection of documents
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.concat(
            F.lit("HTTP://"),
            F.upper(F.col("source")),
            F.lit(".Example.com:80/doc/"),
            F.col("doc_id").cast("string"),
            F.lit("?b=2&a=1#frag"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("doc_id")).alias("warc_ts"),
    )
    n_pages = docs.count()  # warm the file listing before timing
    n_scheduled = expand_frontier(
        pages, robots=None, seed=42, default_budget=1 << 30
    ).count()
    flagship_s = best_of(
        lambda: _materialize(
            expand_frontier(pages, robots=None, seed=42, default_budget=1 << 30)
        )
    )
    timings["flagship_expand_frontier"] = flagship_s

    # flagship at volume: 2M expression-built page URLs through the FULL
    # frontier pipeline (canonicalize → host → hash → dedup → claim) —
    # this is BASELINE.json's headline metric (frontier URLs scheduled/s)
    pages_2m = spark.range(2_000_000).select(
        F.concat(
            F.lit("HTTP://Host"),
            F.pmod(F.col("id"), F.lit(50_000)),
            F.lit(".Example.com:80/p/"),
            F.col("id"),
            F.lit("?b=2&a=1#f"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id") % 86_400).alias("warc_ts"),
    )
    n_sched_2m = expand_frontier(
        pages_2m, robots=None, seed=7, default_budget=1 << 30
    ).count()
    flagship_2m_s = best_of(
        lambda: _materialize(
            expand_frontier(pages_2m, robots=None, seed=7, default_budget=1 << 30)
        )
    )
    timings["flagship_expand_frontier_2m"] = flagship_2m_s

    # claim-scheduler throughput at bench scale: 2M-row expression-built
    # frontier (no disk), politeness-budgeted batch claim, decision set only
    from crawlingathome_server_spark.datagen import synth_frontier_expr
    from crawlingathome_server_spark.operators.claim import claim_batch

    fr2m = synth_frontier_expr(spark, 2_000_000)
    claim_batch(fr2m.limit(50_000), None, seed=0, default_budget=2, with_payload=False).count()
    n_claims_2m = claim_batch(
        fr2m, None, seed=1, default_budget=16, with_payload=False
    ).count()
    claim_s = best_of(
        lambda: claim_batch(
            fr2m, None, seed=1, default_budget=16, with_payload=False
        ).count()
    )
    timings["claim_frontier_2m"] = claim_s

    # URL-seen structure at bench scale: build a bucketed bloom over 1M
    # canonical urls and probe 1M candidates (half seen, half novel)
    from crawlingathome_server_spark.operators import urlseen

    urls = spark.range(1_000_000).select(
        F.concat(F.lit("http://h"), F.pmod(F.col("id"), F.lit(5000)), F.lit(".com/p/"), F.col("id")).alias("canon_url")
    )
    cands = spark.range(500_000, 1_500_000).select(
        F.concat(F.lit("http://h"), F.pmod(F.col("id"), F.lit(5000)), F.lit(".com/p/"), F.col("id")).alias("canon_url")
    )
    n_unseen = 0

    def _urlseen_job():
        nonlocal n_unseen
        flt = urlseen.build_seen_filter(
            urlseen.hash_urls(urls), n_buckets=256, bits_per_bucket=1 << 16
        )
        n_unseen = (
            urlseen.probe_seen_filter(
                urlseen.hash_urls(cands), flt, n_buckets=256, bits_per_bucket=1 << 16
            )
            .filter(~F.col("maybe_seen"))
            .count()
        )

    urlseen_s = best_of(_urlseen_job)
    timings["urlseen_build_probe_1m"] = urlseen_s

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    return {
        "metric": "headline suite wall time",
        "value": total,
        "unit": "sec",
        "timing": "best-of-2 per query",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_pages": n_pages,
        "n_urls_scheduled": n_scheduled,
        # headline throughput from the 2M-URL full-pipeline run; the
        # sf-sized variant is reported alongside for cross-round diffing
        "urls_scheduled_per_sec": round(n_sched_2m / flagship_2m_s, 2),
        "flagship_2m_urls_scheduled": n_sched_2m,
        "urls_scheduled_per_sec_sf": round(n_scheduled / flagship_s, 2) if flagship_s else None,
        "claim_frontier_rows_per_sec": round(2_000_000 / claim_s, 1),
        "claim_urls_scheduled_per_sec": round(n_claims_2m / claim_s, 1),
        "urlseen_urls_per_sec": round(2_000_000 / urlseen_s, 1),
        "urlseen_unseen_found": n_unseen,
        **_scaling_summary(),
    }


def _scaling_summary() -> dict:
    """Attach the last tools/scaling_bench.py result (N vs 4N evidence)."""
    import contextlib

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling.json")
    with contextlib.suppress(Exception):
        with open(path) as f:
            s = json.load(f)
        out = {
            "scaling_efficiency_N_to_4N": s["efficiency"],
            "scaling_N_cores": s["local_N"]["cores"],
            "scaling_4N_cores": s["local_4N"]["cores"],
            "scaling_4N_urls_scheduled_per_sec": s["local_4N"]["urls_scheduled_per_sec"],
        }
        lit = s.get("literal_8_vs_32")
        if lit:
            out["scaling_efficiency_8_to_32_literal"] = lit["efficiency"]
            out["scaling_32_urls_scheduled_per_sec"] = lit["local_32"][
                "urls_scheduled_per_sec"
            ]
        fp = s.get("frontier_pipeline")
        if fp:
            out["scaling_efficiency_frontier_pipeline"] = fp["efficiency"]
        return out
    return {}


def main() -> None:
    from crawlingathome_server_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench", cores="*")
    try:
        result = run_bench(spark, sf_dir)
    finally:
        spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
