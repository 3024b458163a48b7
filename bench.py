"""Headline benchmark. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query timings are best-of-2 (the box hosts noisy CPU neighbors; the
min-of-N protocol is documented in BENCH/BASELINE.md). Protocol history
(cross-round deltas): r01 single-shot + count() sink; r02 best-of-2 +
count() sink; r03+ best-of-2 + NOOP-WRITE sink — count() let Catalyst
prune projection-only queries down to a parquet row-count (VERDICT r2
#1), so r03 projection timings are the first honest ones and are
EXPECTED to be higher than r02's.

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


def _materialize(df) -> None:
    """Force full execution of EVERY output column without collecting
    rows to the driver. Spark's built-in noop sink consumes each row
    whole, so nothing above the scan can be pruned — unlike count(),
    which folds a projection-only plan into a parquet row-count
    (NOTES.md; VERDICT r2 'what's wrong' #1)."""
    df.write.format("noop").mode("overwrite").save()


def run_bench(spark, sf_dir: str) -> dict:
    import __spark_entry__ as se
    from pyspark.sql import functions as F

    from crawlingathome_server_spark.plans.rounds import expand_frontier

    # noisy-neighbor telemetry (r07): same-code session runs spanned
    # 114-167 s wall this round purely on box load; record the 1-min
    # load at start/end so a cross-round diff can be adjudicated
    # against the conditions it ran under
    load_start = round(os.getloadavg()[0], 2)

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
    # contrast row for the r04 JVM bpeish counter (the t_token_count_bpeish
    # headline above): the retired-from-headline pandas UDF path
    from crawlingathome_server_spark.functions.text import token_count_bpeish

    timings["t_token_bpeish_pandas_udf"] = best_of(
        lambda: _materialize(
            docs_sf.select("doc_id", token_count_bpeish(F.col("text")).alias("n"))
        )
    )
    timings["dedup_minhash_lsh_expr"] = best_of(
        lambda: _materialize(minhash_dedup(docs_sf, threshold=0.5, mode="expr", reuse=True))
    )
    timings["dedup_simhash_expr"] = best_of(
        lambda: _materialize(simhash_candidates(docs_sf, max_hamming=3, reuse=True))
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
        lambda: _materialize(
            claim_batch(fr2m, None, seed=1, default_budget=16, with_payload=False)
        )
    )
    timings["claim_frontier_2m"] = claim_s

    # the COLUMN-budget (robots) claim path at the same volume — the salted
    # two-phase rank that exists precisely for 100× hot-host skew (VERDICT
    # r2 item #2: stress-tested but previously unbenched). Per-host budgets
    # 1..16 (mean ≈ the literal path's 16 is not matched on purpose — the
    # comparison is plan shape, not claim count).
    robots_2m = spark.range(50_000).select(
        F.concat(F.lit("host"), F.col("id"), F.lit(".example.com")).alias("host"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(16)) + 1)
        .cast("int")
        .alias("max_claims_per_round"),
    )

    def _budgeted():
        return claim_batch(fr2m, robots_2m, seed=1, with_payload=False)

    # plan assertion: the BENCHED plan must contain both rank phases
    # (salted pre-rank + exact per-host re-rank)
    budgeted_plan = _budgeted()._jdf.queryExecution().executedPlan().toString()
    assert budgeted_plan.count("Window") >= 2, budgeted_plan
    n_claims_budgeted = _budgeted().count()
    timings["claim_frontier_2m_budgeted"] = best_of(
        lambda: _materialize(_budgeted())
    )

    # the claim THROUGH the store (r07, VERDICT r06 next #1 done-
    # criterion): the same 2M-row open sidecar committed once under the
    # classic key-hashed layout and once under the host_key BUCKET
    # layout; claim_batch over store.read() of each. The bucketed read
    # satisfies the rank window's distribution at the scan, so its plan
    # carries ZERO Exchange — the delta between these two rows is
    # exactly what the layout buys (at 10^10 rows: the ~400 GB/round
    # rank shuffle).
    import shutil as _shutil
    import tempfile as _tempfile

    from crawlingathome_server_spark.functions.urls import seeded_hash64
    from crawlingathome_server_spark.sources.checkpoint import (
        CheckpointStore as _Store,
    )

    side2m = fr2m.select(
        "number", "host", "priority", "gpu",
        seeded_hash64(F.col("host")).alias("host_key"),
    )
    _store_roots = []
    try:
        st_classic_root = _tempfile.mkdtemp(prefix="claim_store_c", dir="/tmp")
        st_bucket_root = _tempfile.mkdtemp(prefix="claim_store_b", dir="/tmp")
        _store_roots += [st_classic_root, st_bucket_root]
        st_c = _Store(st_classic_root, n_partitions=32)
        st_b = _Store(
            st_bucket_root, n_partitions=32,
            bucket_layouts={"open_frontier": ("host_key", 32)},
        )
        st_c.commit({"open_frontier": side2m}, seed=1, round_epoch=0)
        st_b.commit({"open_frontier": side2m}, seed=1, round_epoch=0)

        def _claim_from(store):
            side = (
                store.read(spark, "open_frontier")
                .withColumn("pending", F.lit(False))
                .withColumn("closed", F.lit(False))
            )
            return claim_batch(
                side, None, seed=1, default_budget=16, with_payload=False
            )

        bucketed_plan = (
            _claim_from(st_b)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in bucketed_plan, bucketed_plan
        timings["claim_store_2m"] = best_of(
            lambda: _materialize(_claim_from(st_c))
        )
        timings["claim_bucketed_store_2m"] = best_of(
            lambda: _materialize(_claim_from(st_b))
        )
    finally:
        for r in _store_roots:
            _shutil.rmtree(r, ignore_errors=True)

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

    # the deletion-capable cuckoo variant on the same 1M build / 1M probe
    # workload (same cogroup architecture; ~16 bits/key vs the bloom's
    # ~10, FPR ~0.01% vs 1%, and it can forget — url expiry/re-crawl)
    cparams = urlseen.auto_cuckoo_params(1_000_000)
    n_unseen_cuckoo = 0

    def _cuckoo_job():
        nonlocal n_unseen_cuckoo
        flt = urlseen.build_cuckoo_filter(urlseen.hash_urls(urls), **cparams)
        n_unseen_cuckoo = (
            urlseen.probe_cuckoo_filter(urlseen.hash_urls(cands), flt, **cparams)
            .filter(~F.col("maybe_seen"))
            .count()
        )

    timings["cuckooseen_build_probe_1m"] = best_of(_cuckoo_job)

    # the deletion contrast that justifies the cuckoo at all: expiring
    # 50k of 2M seen urls is O(expired) for the cuckoo (touched buckets
    # only); a bloom pays a full 2M rebuild (~ urlseen_build time above)
    cparams2m = urlseen.auto_cuckoo_params(2_000_000)
    urls_2m_seen = spark.range(2_000_000).select(
        F.concat(F.lit("http://h"), F.pmod(F.col("id"), F.lit(5000)), F.lit(".com/p/"), F.col("id")).alias("canon_url")
    )
    expired_50k = urls_2m_seen.limit(50_000)
    cuckoo_2m = urlseen.build_cuckoo_filter(
        urlseen.hash_urls(urls_2m_seen), **cparams2m
    ).cache()
    cuckoo_2m.count()  # materialize the base filter outside the timing
    timings["cuckoo_expire_50k_of_2m"] = best_of(
        lambda: _materialize(
            urlseen.delete_from_cuckoo(
                cuckoo_2m, urlseen.hash_urls(expired_50k), **cparams2m
            )
        )
    )
    cuckoo_2m.unpersist()

    # F10 extract_text at volume (VERDICT r2 item #4): the per-page work
    # that dominates a 100 TB crawl. Expression-built html corpus (~1 KB/
    # page, incl. a script block + entities), both the byte-stable pandas
    # path and the codegen JVM twin, reported as MB/s.
    from crawlingathome_server_spark.functions.text import (
        extract_text,
        extract_text_jvm,
    )

    n_html = 400_000
    filler = (
        "the quick brown fox jumps over the lazy dog while the crawler "
        "counts tokens and strips boilerplate markup from each page "
    )
    html_pages = spark.range(n_html).select(
        "id",
        F.encode(
            F.concat(
                F.lit("<html><head><title>t"),
                F.col("id"),
                F.lit("</title><script>var x=1; if (x&lt;2) {}</script></head><body><p>"),
                F.repeat(F.lit(filler), (F.pmod(F.col("id"), F.lit(5)) + 4).cast("int")),
                F.lit("&amp; tail &lt;tag&gt; of doc "),
                F.col("id"),
                F.lit('</p><a href="http://h'),
                F.pmod(F.col("id"), F.lit(997)),
                F.lit(".example.com/next/"),
                F.col("id"),
                F.lit('">n</a></body></html>'),
            ),
            "UTF-8",
        ).alias("html")
    )
    html_bytes = html_pages.agg(F.sum(F.length("html"))).collect()[0][0]
    timings["extract_text_400k_pandas"] = best_of(
        lambda: _materialize(html_pages.select(extract_text(F.col("html")).alias("t")))
    )
    timings["extract_text_400k_jvm"] = best_of(
        lambda: _materialize(html_pages.select(extract_text_jvm(F.col("html")).alias("t")))
    )

    # the TRUE crawl loop at volume: href extraction (JVM regex, r03) →
    # RELATIVE-href resolution against the page url (r04) → canonicalize
    # → dedup → URL-seen-free claim — frontier expansion from raw pages,
    # Python-free (plan-asserted in tests/test_plans.py). The corpus gets
    # an extra relative link per page (appended HERE so the extract_text
    # rows above stay byte-identical to r03's — like-for-like timing);
    # each page needs a url for the resolver base.
    html_with_ts = html_pages.select(
        F.concat(
            F.lit("http://h"),
            F.pmod(F.col("id"), F.lit(997)),
            F.lit(".example.com/dir/page"),
            F.col("id"),
        ).alias("url"),
        F.concat(
            "html",
            F.encode(
                F.concat(F.lit('<a href="../rel/'), F.col("id"), F.lit('">r</a>')),
                "UTF-8",
            ),
        ).alias("html"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id") % 86_400).alias(
            "warc_ts"
        ),
    )
    n_links_scheduled = expand_frontier(
        html_with_ts, None, seed=3, default_budget=1 << 30, follow_links=True
    ).count()
    follow_links_s = best_of(
        lambda: _materialize(
            expand_frontier(
                html_with_ts, None, seed=3, default_budget=1 << 30, follow_links=True
            )
        )
    )
    timings["flagship_follow_links_400k"] = follow_links_s

    # crawl→curate composite at volume (r07): CrawlEngine(curate=True)
    # runs the training-data pipeline — JVM text extraction → lang gate →
    # quality gate → fingerprint dedup (within-round + vs the persisted
    # corpus) — inside a real store-committed round. Round 1 (untimed)
    # seeds 200k docs; the timed round curates 300k pages of which 100k
    # are exact re-crawls (cross-round fingerprint dedup drops them).
    # Best-of-2 over fresh stores, like the other stateful rounds.
    # At this corpus size the dedup takes the exact anti-join path; the
    # filter-first probe path (and its measured ~32M-doc local
    # crossover) is benched separately in tools/curate_filter_bench.py
    # → BENCH/curate_filter.json.
    import tempfile

    from crawlingathome_server_spark.plans.rounds import CrawlEngine as _CE
    from crawlingathome_server_spark.sources.checkpoint import (
        CheckpointStore as _CS,
    )

    def _curate_bench_pages(lo: int, hi: int):
        return spark.range(lo, hi).select(
            F.concat(
                F.lit("http://h"),
                F.pmod(F.col("id"), F.lit(997)),
                F.lit(".example.com/dir/page"),
                F.col("id"),
            ).alias("url"),
            F.timestamp_seconds(
                F.lit(1_600_000_000) + F.col("id") % 86_400
            ).alias("warc_ts"),
            F.concat(
                F.lit("<html><head><title>t"),
                F.col("id"),
                F.lit("</title></head><body><p>"),
                F.repeat(
                    F.lit(filler), (F.pmod(F.col("id"), F.lit(5)) + 4).cast("int")
                ),
                F.lit("doc "),
                F.col("id"),
                F.lit("</p></body></html>"),
            ).alias("html"),
        )

    curate_attempts = []
    for _ in range(2):
        cur_root = tempfile.mkdtemp(prefix="crawl_curate_bench", dir="/tmp")
        cstore = _CS(cur_root, n_partitions=32)
        ceng = _CE(
            spark, cstore, seed=5, default_budget=1 << 30,
            curate=True, curate_min_chars=50,
        )
        ceng.bootstrap()
        ceng.run_round(_curate_bench_pages(0, 200_000), round_epoch=1)
        curate_attempts.append((cur_root, cstore, ceng))
    try:
        cur_times = []
        for _, _, ceng in curate_attempts:
            t0 = time.perf_counter()
            ceng.run_round(_curate_bench_pages(100_000, 400_000), round_epoch=2)
            cur_times.append(time.perf_counter() - t0)
        timings["crawl_curate_round_300k"] = round(min(cur_times), 4)
        cc = curate_attempts[-1][1].read_manifest(
            curate_attempts[-1][1].latest_snapshot_id()
        )["counters"]
        assert cc["n_curated"] == 200_000, cc
        assert cc["n_corpus_total"] == 400_000, cc
    finally:
        for cur_root, _, _ in curate_attempts:
            import shutil as _sh

            _sh.rmtree(cur_root, ignore_errors=True)

    # training-data export packing at volume (r07): 2M synthesized doc
    # stats (fingerprint + n_tokens — packing consumes stats columns,
    # never text) through pack_chunks (pure built-in: one shuffle on
    # shard + a per-shard running-sum window) and pack_greedy (the
    # no-split applyInPandas packer) at 256 shards / seq_len 2048. At
    # 10^9 docs the per-shard work is this same sort+scan at ~4M
    # rows/shard, shard-parallel across the cluster.
    from crawlingathome_server_spark.operators import packing as _packing

    doc_stats_2m = spark.range(2_000_000).select(
        F.xxhash64("id").alias("fingerprint"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1900)) + 120)
        .cast("int")
        .alias("n_tokens"),
    )
    _materialize(_packing.pack_chunks(doc_stats_2m, 2048, n_shards=256))
    timings["pack_chunks_2m"] = best_of(
        lambda: _materialize(
            _packing.pack_chunks(doc_stats_2m, 2048, n_shards=256)
        )
    )
    timings["pack_greedy_2m"] = best_of(
        lambda: _materialize(
            _packing.pack_greedy(doc_stats_2m, 2048, n_shards=256)
        )
    )

    # C4-style cross-corpus line dedup at volume (r07): 400k synthetic
    # docs x 8 lines, 25% of lines drawn from a 1k-line boilerplate pool
    # (appears in ~100 docs each -> dropped), the rest unique. Exercises
    # the full explode -> count-distinct -> anti-join -> ordered
    # reassembly pipeline.
    from crawlingathome_server_spark.operators.dedup import line_dedup

    docs_ld = spark.range(400_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "\n",
            *[
                F.when(
                    F.pmod(F.xxhash64("id", F.lit(j)), F.lit(4)) == 0,
                    F.concat(
                        F.lit("boilerplate line "),
                        F.pmod(F.xxhash64("id", F.lit(j + 100)), F.lit(1_000)),
                    ),
                ).otherwise(
                    F.concat(
                        F.lit("unique content "), F.col("id"), F.lit(" seg "), F.lit(j)
                    )
                )
                for j in range(8)
            ],
        ).alias("text"),
    )
    timings["line_dedup_400k"] = best_of(
        lambda: _materialize(line_dedup(docs_ld, min_docs=3))
    )

    # one full crawl round THROUGH the checkpoint store at volume (VERDICT
    # r2 item #5): 2M pages in, bloom probe against the prior round's
    # persisted filter, politeness claim, seen-set delta-commit + filter
    # OR-merge + manifest out. Round 1 (untimed) seeds the store; round 2
    # (timed, single-shot — the engine is stateful, so best-of-N would
    # time different rounds) is the steady-state delta path: half its
    # pages are already seen.
    import shutil
    import tempfile

    from crawlingathome_server_spark.plans.rounds import CrawlEngine
    from crawlingathome_server_spark.sources.checkpoint import CheckpointStore

    def _crawl_pages(lo: int, hi: int):
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

    # r07 (VERDICT r06 next #2a): the crawl/discovery rounds were the
    # suite's only single-shot rows and produced phantom ±50% swings on
    # this noisy box. The engine is stateful, so best-of-N over ONE
    # store would time different rounds; instead each attempt gets its
    # own fresh store (untimed seeding round), and the TIMED
    # steady-state rounds run interleaved across the attempts — min
    # wins, like every other row.
    crawl_attempts = []
    for _ in range(2):
        crawl_root = tempfile.mkdtemp(prefix="crawl_round_bench", dir="/tmp")
        store = CheckpointStore(crawl_root, n_partitions=32)
        engine = CrawlEngine(spark, store, seed=5, default_budget=1 << 30)
        engine.bootstrap()
        engine.run_round(_crawl_pages(0, 2_000_000), round_epoch=1)
        crawl_attempts.append((crawl_root, store, engine))
    try:
        crawl_times = []
        for _, _, engine in crawl_attempts:
            t0 = time.perf_counter()
            engine.run_round(_crawl_pages(1_000_000, 3_000_000), round_epoch=2)
            crawl_times.append(time.perf_counter() - t0)
        crawl_round_s = round(min(crawl_times), 4)
        store = crawl_attempts[-1][1]
        final_counters = store.read_manifest(store.latest_snapshot_id())["counters"]
        n_round2 = final_counters["n_claimed"]
        snap_dir = os.path.join(
            crawl_attempts[-1][0], f"s{store.latest_snapshot_id():06d}"
        )
        crawl_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(snap_dir)
            for f in fs
        )
    finally:
        for crawl_root, _, _ in crawl_attempts:
            shutil.rmtree(crawl_root, ignore_errors=True)
    timings["crawl_round_2m_commit"] = crawl_round_s

    # r06 discovery loop at dim scale: round 1 (untimed) claims 2M urls
    # across 50k NEW hosts and queues all 50k robots.txt fetches; round 2
    # (timed, single-shot) ingests 50k fetched bodies — RFC 9309 parse
    # into the politeness dim (whose Disallow/crawl-delay govern that
    # same round's claim), 50k advertised sitemaps queued — plus the 1M
    # new-url claim and all the O(delta) Append commits. Bodies are
    # expression-built from the engine's own worklist (no Python rows).
    # This is the WORST-case ingestion round (a brand-new crawl
    # discovering its whole host universe at once): the added cost over
    # crawl_round_2m_commit decomposes (re-measured r07, quiet window,
    # after the bucket-aligned concurrent commit + single rules+budget
    # dim join) into ~3-4 s one-time pandas-UDF body parsing
    # (O(fetched), cached — steady rounds fetch incrementally), ~2.5 s
    # rules+budget fold/claim over 2M candidates (the recurring
    # politeness work — every discovery round pays it, see the steady
    # row), ~2.4 s worklist bookkeeping (ingest anti-joins + claimed-
    # host distinct), ~1 s extra commit tables (concurrent, max-bound).
    # Steady-round decomposition (tools/profile_steady2.py, quiet, late
    # r07 after the __path staging fix): 14.0 s vs plain 7.7 s =
    # +3.3 s budgeted CLAIM (the salted two-phase per-host rank + rule
    # fold the politeness dim semantically requires — the plain round
    # ranks against one literal budget), +0.9 s ingest (1k bodies),
    # +1.3 s finish (claimed-host distinct + worklist anti-joins),
    # +0.8 s commit growth (5 tables concurrent, max-bound at the
    # urlseen_filter table). The ~1.8× steady ratio IS the price of
    # politeness-governed claiming, not discovery bookkeeping.
    def _robots_bodies(hosts_df):
        return hosts_df.select(
            "host",
            F.concat(
                F.lit("User-agent: *\nDisallow: /private\nCrawl-delay: 1\n"
                      "Sitemap: http://"),
                F.col("host"),
                F.lit("/sm.xml\n"),
            ).alias("robots_txt"),
        )

    # steady-state pages (r07, VERDICT r06 next #4): 2M pages of which
    # 98% hit the KNOWN 50k-host universe and 2% (40k pages) land on 1k
    # brand-new hosts — the incremental-discovery regime a crawl lives
    # in after its first rounds, vs the all-50k-hosts-at-once worst case.
    # The page mix mirrors the plain round-2 profile EXACTLY (~1M
    # already-seen + ~1M new → total stays at the 4M filter capacity):
    # a steady crawl's filter rebuild is amortized over the capacity-
    # doubling cadence, so a fair steady-vs-plain ratio must not hide a
    # 5M-url bloom rebuild inside one "steady" round (first measurement
    # did exactly that: 29 s, ratio 2.5).
    def _steady_pages():
        known = _crawl_pages(2_000_000, 3_960_000)
        fresh = spark.range(20_000_000, 20_040_000).select(
            F.concat(
                F.lit("http://host"),
                F.lit(50_000) + F.pmod(F.col("id"), F.lit(1_000)),
                F.lit(".example.com/p/"),
                F.col("id"),
            ).alias("url"),
            F.timestamp_seconds(
                F.lit(1_600_000_000) + F.col("id") % 86_400
            ).alias("warc_ts"),
        )
        return known.unionByName(fresh)

    disc_attempts = []
    for _ in range(2):
        disc_root = tempfile.mkdtemp(prefix="crawl_disc_bench", dir="/tmp")
        store = CheckpointStore(disc_root, n_partitions=32)
        engine = CrawlEngine(
            spark, store, seed=5, default_budget=1 << 30, discovery=True
        )
        engine.bootstrap()
        engine.run_round(_crawl_pages(0, 2_000_000), round_epoch=1)
        bodies = _robots_bodies(engine.robots_worklist())
        disc_attempts.append((disc_root, store, engine, bodies))
    try:
        disc_times = []
        for _, _, engine, bodies in disc_attempts:
            t0 = time.perf_counter()
            engine.run_round(
                _crawl_pages(1_000_000, 3_000_000),
                round_epoch=2,
                robots_fetched=bodies,
            )
            disc_times.append(time.perf_counter() - t0)
        timings["crawl_discovery_round_2m"] = round(min(disc_times), 4)
        dc = disc_attempts[-1][1].read_manifest(
            disc_attempts[-1][1].latest_snapshot_id()
        )["counters"]
        assert dc["n_robots_fetched"] == 50_000, dc
        assert dc["n_sitemaps_discovered"] == 50_000, dc
        # steady-state discovery round (same stores, round 3): ~2% new
        # hosts, 1k robots bodies ingested instead of 50k
        steady_times = []
        for _, store, engine, _ in disc_attempts:
            fresh_hosts = spark.range(1_000).select(
                F.concat(
                    F.lit("host"),
                    F.lit(50_000) + F.col("id"),
                    F.lit(".example.com"),
                ).alias("host")
            )
            t0 = time.perf_counter()
            engine.run_round(
                _steady_pages(),
                round_epoch=3,
                robots_fetched=_robots_bodies(fresh_hosts),
            )
            steady_times.append(time.perf_counter() - t0)
        timings["crawl_discovery_steady_2m"] = round(min(steady_times), 4)
        sc_ = disc_attempts[-1][1].read_manifest(
            disc_attempts[-1][1].latest_snapshot_id()
        )["counters"]
        assert sc_["n_robots_fetched"] == 1_000, sc_
    finally:
        for disc_root, _, _, _ in disc_attempts:
            shutil.rmtree(disc_root, ignore_errors=True)

    # RoundEngine frontier-commit cost vs frontier SIZE (VERDICT r03 item
    # #3): same ~100k-claim round over a 2M- and a 16M-row frontier, in
    # both commit modes. The r04 'patch' mode (merge-on-read) point-reads
    # touched buckets, re-applies the transition chain to just those rows,
    # and commits them as a delta LAYER — its size-growth is only the
    # (inherent, narrow-projection) claim scan; the pre-r04 'rewrite'
    # mode re-executes the whole transition plan and pays the full-table
    # write. (Bucket-granular Append is no contrast here: 100k uniformly
    # hashed keys touch every bucket, degenerating to a full rewrite —
    # see NOTES.md r04.) Single-shot timings (stateful engine); rewrite
    # runs FIRST (a key-delta commit is refused once layers exist).
    from crawlingathome_server_spark.datagen import workers as synth_workers
    from crawlingathome_server_spark.plans.rounds import RoundEngine

    rr_times = {}
    for label, n_rows in (("2m", 2_000_000), ("16m", 16_000_000)):
        rr_root = tempfile.mkdtemp(prefix=f"rr_bench_{label}", dir="/tmp")
        try:
            store = CheckpointStore(rr_root, n_partitions=64)
            eng = RoundEngine(spark, store, seed=9, host_default_budget=2)
            eng.bootstrap(
                synth_frontier_expr(spark, n_rows), synth_workers(spark)
            )  # untimed full write
            for ep, mode in ((1, "rewrite"), (2, "patch")):
                t0 = time.perf_counter()
                eng.run_round(round_epoch=ep, frontier_commit=mode)
                rr_times[f"roundengine_{label}_{mode}"] = round(
                    time.perf_counter() - t0, 4
                )
        finally:
            shutil.rmtree(rr_root, ignore_errors=True)
    timings.update(rr_times)

    # r05 open-set sidecar (VERDICT r04 missing #1): MATURE-crawl shape —
    # 1% of the frontier open (the politeness rank's true input). Two
    # stores, 2M and 16M rows at the same 1% open fraction: the patch
    # round's cost should be near-FLAT in table size now that the claim
    # ranks over the sidecar (the remaining growth is the narrow merge
    # point-read, a sort-free columnar scan). After three committed
    # rounds (3 live MOR layers on both tables — the steady state), the
    # claim contrast on the 16M store: sidecar claim (O(open)
    # reconstruction) vs the r04 path
    # (full frontier MOR reconstruction + rank). Best-of-2, noop sink.
    from crawlingathome_server_spark.operators import claim as claim_op

    n_open = 0
    for label, n_rows in (("2m", 2_000_000), ("16m", 16_000_000)):
        rr_root = tempfile.mkdtemp(prefix=f"rr_bench_{label}1pct", dir="/tmp")
        try:
            store = CheckpointStore(rr_root, n_partitions=64)
            eng = RoundEngine(spark, store, seed=9, host_default_budget=2)
            eng.bootstrap(
                synth_frontier_expr(spark, n_rows, open_frac=0.01),
                synth_workers(spark),
            )
            t0 = time.perf_counter()
            eng.run_round(round_epoch=1, frontier_commit="patch")
            timings[f"roundengine_{label}_1pct_patch"] = round(
                time.perf_counter() - t0, 4
            )
            if label == "16m":
                # two more (untimed) rounds → 3 live MOR layers on both
                # tables: the steady-state shape the claim contrast
                # below should be measured against
                eng.run_round(round_epoch=2, frontier_commit="patch")
                eng.run_round(round_epoch=3, frontier_commit="patch")
                n_open = store.read_manifest(store.latest_snapshot_id())[
                    "tables"
                ][RoundEngine.OPEN_SIDECAR]["total_rows"]
                sidecar = (
                    store.read(spark, RoundEngine.OPEN_SIDECAR)
                    .withColumn("pending", F.lit(False))
                    .withColumn("closed", F.lit(False))
                )
                timings["claim_sidecar_16m_1pct"] = best_of(
                    lambda: _materialize(
                        claim_op.claim_batch(
                            sidecar, None, seed=5, default_budget=2,
                            with_payload=False,
                        )
                    )
                )
                full = store.read(spark, "frontier")
                timings["claim_fullscan_16m_1pct"] = best_of(
                    lambda: _materialize(
                        claim_op.claim_batch(
                            full, None, seed=5, default_budget=2,
                            with_payload=False,
                        )
                    )
                )
        finally:
            shutil.rmtree(rr_root, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    n_cores = spark.sparkContext.defaultParallelism
    html_mb = html_bytes / 1e6
    return {
        "metric": "headline suite wall time",
        "value": total,
        "unit": "sec",
        "loadavg_1m": {"start": load_start, "end": round(os.getloadavg()[0], 2)},
        "timing": "best-of-2 per query, noop-write sink (r03 protocol; "
        "crawl_round_2m_commit is single-shot — stateful)",
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
        "claim_budgeted_rows_per_sec": round(
            2_000_000 / timings["claim_frontier_2m_budgeted"], 1
        ),
        "claim_budgeted_urls_scheduled": n_claims_budgeted,
        # store-layout win (r07): classic key-hashed store read vs the
        # host_key-bucketed layout on the identical 2M open set
        "claim_bucketed_store_speedup": round(
            timings["claim_store_2m"] / timings["claim_bucketed_store_2m"], 2
        ),
        "urlseen_urls_per_sec": round(2_000_000 / urlseen_s, 1),
        "urlseen_unseen_found": n_unseen,
        "cuckooseen_urls_per_sec": round(
            2_000_000 / timings["cuckooseen_build_probe_1m"], 1
        ),
        "cuckooseen_unseen_found": n_unseen_cuckoo,
        "extract_text_html_mb": round(html_mb, 1),
        "extract_text_pandas_mb_per_sec": round(
            html_mb / timings["extract_text_400k_pandas"], 1
        ),
        "extract_text_pandas_mb_per_sec_per_core": round(
            html_mb / timings["extract_text_400k_pandas"] / n_cores, 2
        ),
        "extract_text_jvm_mb_per_sec": round(
            html_mb / timings["extract_text_400k_jvm"], 1
        ),
        "extract_text_jvm_mb_per_sec_per_core": round(
            html_mb / timings["extract_text_400k_jvm"] / n_cores, 2
        ),
        "follow_links_urls_scheduled": n_links_scheduled,
        "follow_links_pages_per_sec": round(n_html / follow_links_s, 1),
        "crawl_round_pages_per_sec": round(2_000_000 / crawl_round_s, 1),
        # crawl→curate composite round: 300k fetched pages through
        # extract → lang → quality → fingerprint dedup → corpus Append
        "curate_pages_per_sec": round(
            300_000 / timings["crawl_curate_round_300k"], 1
        ),
        # steady-state discovery vs the plain crawl round. The r06
        # verdict's ~1.2x target was set against the r06 plain round
        # (17.5 s driver-recorded); the r07 commit/layout fixes halved
        # the plain round, so the ratio denominator moved — in ABSOLUTE
        # terms the steady round fell 32 -> ~13.6 s and its overhead over
        # plain decomposes (quiet window) as ~2.5 s recurring politeness
        # rules+budget claim (the feature itself), ~2.4 s ingest+worklist
        # bookkeeping, ~1 s extra commit tables. Ratio ~1.6-1.9 against
        # the new fast plain round; would read 0.78x against r06's.
        "crawl_discovery_steady_ratio": round(
            timings["crawl_discovery_steady_2m"] / crawl_round_s, 3
        ),
        # growth factor of round time when the frontier grows 8x: patch
        # should stay near the claim-scan growth; rewrite pays the full
        # transition re-execution + full-table write
        "roundengine_8x_growth_patch": round(
            rr_times["roundengine_16m_patch"] / rr_times["roundengine_2m_patch"], 2
        ),
        "roundengine_8x_growth_rewrite": round(
            rr_times["roundengine_16m_rewrite"] / rr_times["roundengine_2m_rewrite"],
            2,
        ),
        "crawl_round_urls_claimed": n_round2,
        "crawl_round_bytes_rewritten": crawl_bytes,
        "crawl_round_seen_total": final_counters["n_seen"],
        # r05 sidecar evidence: r04-path (full MOR reconstruct + rank) vs
        # open-set claim on the same 16M/1%-open 1-layer snapshot, the
        # open-row count behind it, and the 8x-table growth factor of a
        # 1%-open patch round (near-flat = the claim no longer scales
        # with frontier size)
        "open_sidecar_rows_16m_1pct": n_open,
        "claim_sidecar_speedup_16m_1pct": round(
            timings["claim_fullscan_16m_1pct"] / timings["claim_sidecar_16m_1pct"],
            2,
        ),
        "roundengine_8x_growth_patch_1pct": round(
            timings["roundengine_16m_1pct_patch"]
            / timings["roundengine_2m_1pct_patch"],
            2,
        ),
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
        p416 = s.get("pair_4_16")
        if p416:
            out["scaling_efficiency_4_to_16"] = p416["efficiency"]
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


#: top-level fields of the PRINTED line. The full result is archived in
#: BENCH/last_bench_sf{sf}.json; the printed line stays well under the
#: driver's stdout-tail capture window (r03's ~3.4 KB line overflowed it
#: and was recorded as parsed:null — VERDICT r03 item #2).
_COMPACT_KEYS = (
    "metric",
    "value",
    "unit",
    "sf",
    "urls_scheduled_per_sec",
    "flagship_2m_urls_scheduled",
    "claim_frontier_rows_per_sec",
    "urlseen_urls_per_sec",
    "cuckooseen_urls_per_sec",
    "extract_text_pandas_mb_per_sec",
    "extract_text_jvm_mb_per_sec",
    "follow_links_urls_scheduled",
    "follow_links_pages_per_sec",
    "crawl_round_pages_per_sec",
    "crawl_round_bytes_rewritten",
    "crawl_discovery_steady_ratio",
    "claim_bucketed_store_speedup",
    "curate_pages_per_sec",
    "loadavg_1m",
    "roundengine_8x_growth_patch",
    "roundengine_8x_growth_rewrite",
    "claim_sidecar_speedup_16m_1pct",
    "roundengine_8x_growth_patch_1pct",
    "scaling_efficiency_N_to_4N",
    "scaling_efficiency_4_to_16",
    "scaling_efficiency_8_to_32_literal",
    "scaling_efficiency_frontier_pipeline",
)


def main() -> None:
    from crawlingathome_server_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench", cores="*")
    try:
        result = run_bench(spark, sf_dir)
    finally:
        spark.stop()
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH",
        f"last_bench_sf{result['sf']}.json",
    )
    try:
        with open(full_path, "w") as f:
            json.dump(result, f, indent=2, sort_keys=True)
    except OSError:
        pass  # read-only checkout: the printed line still carries the KPIs
    compact = {k: result[k] for k in _COMPACT_KEYS if k in result}
    compact["queries"] = {k: round(v, 3) for k, v in result["queries"].items()}
    compact["full"] = os.path.relpath(full_path, os.path.dirname(full_path) + "/..")
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
