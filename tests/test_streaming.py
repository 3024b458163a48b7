"""Structured-Streaming variants of the daemon loops (T1/T2/T3)."""

import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawlingathome_server_spark.streaming import heartbeats as hb


def _beats_pdf(rows):
    return pd.DataFrame(rows, columns=["uuid", "epoch", "progress", "shard_number"])


def test_liveness_stream_tracks_and_reaps(spark, tmp_path):
    src = tmp_path / "beats"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    pdf = _beats_pdf(
        [
            ("w1", 1000, "50%", 7),
            ("w1", 1060, "60%", 7),
            ("w2", 1000, "10%", None),
        ]
    )
    spark.createDataFrame(pdf, schema=hb.HEARTBEAT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    q = hb.run_heartbeat_stream(
        spark, str(src), ckpt, idle_timeout_s=2, query_name="liveness_t"
    )

    def wait_for(pred, timeout_s=120):
        # NOTE: processAllAvailable() does not terminate under
        # ProcessingTimeTimeout (timeout-firing batches keep scheduling);
        # poll the memory sink with a deadline instead.
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM liveness_t").collect()
            if pred(rows):
                return rows
            time.sleep(2)
        raise AssertionError("condition not reached; rows=%s" % rows)

    try:
        out = wait_for(
            lambda rows: {"w1", "w2"} <= {r["uuid"] for r in rows if r["event"] == "alive"}
        )
        alive = {r["uuid"]: r for r in out if r["event"] == "alive"}
        assert alive["w1"]["n_beats"] == 2
        assert alive["w1"]["last_seen"] == 1060
        assert alive["w1"]["shard_number"] == 7
        assert alive["w2"]["n_beats"] == 1

        # the 2 s processing-time timeout then reaps both workers
        out2 = wait_for(
            lambda rows: {"w1", "w2"} <= {r["uuid"] for r in rows if r["event"] == "reaped"}
        )
        # reap carries the shard to release (U1 semantics)
        w1_reap = [r for r in out2 if r["event"] == "reaped" and r["uuid"] == "w1"][0]
        assert w1_reap["shard_number"] == 7
    finally:
        q.stop()


def test_eta_stream_batch_semantics(spark):
    """eta_stream logic on a bounded DF (streaming-agnostic agg)."""
    rows = [(i, pd.Timestamp("2021-01-01 00:00:00") + pd.Timedelta(minutes=m),)
            for i, m in enumerate(range(0, 300, 5))]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "ts"]))
    out = hb.eta_stream(df, interval="15 minutes", window_len=10)
    pdf = out.toPandas().sort_values("window_start")
    assert (pdf["n_completed"] > 0).all()
    # steady 1 completion / 5 min → full 150-min windows hold 30
    assert pdf["n_completed"].max() == 30
    full = pdf[pdf["n_completed"] == 30]
    assert abs(full["jobs_per_s"].iloc[0] - 30 / 9000) < 1e-9


def test_counters_freshness(spark):
    from crawlingathome_server_spark import schemas

    df = spark.createDataFrame(
        [("pairs", 100, 1000), ("eta", 5, 2000)], schema=schemas.COUNTERS
    )
    fresh = hb.counters_snapshot(df, now_epoch=1500)
    assert [r["key"] for r in fresh.collect()] == ["eta"]


def test_eta_stream_in_streaming_mode(spark, tmp_path):
    """The same window agg wired as an actual stream."""
    src = tmp_path / "comp"
    src.mkdir()
    rows = [(i, pd.Timestamp("2021-01-01 00:00:00") + pd.Timedelta(minutes=5 * i))
            for i in range(40)]
    pdf = pd.DataFrame(rows, columns=["id", "ts"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema("id long, ts timestamp").parquet(str(src))
    q = (
        hb.eta_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("eta_t")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        # append mode only emits windows the watermark has closed; the agg
        # itself ran as a stream — presence of the query + no error is the
        # wiring check, closed windows appear after enough event time
        assert q.isActive
    finally:
        q.stop()


def test_liveness_stream_resumes_from_checkpoint(spark, tmp_path):
    """Stop the stateful stream and restart it with the same checkpoint:
    per-worker state (beat counts) must carry across the restart."""
    src = tmp_path / "beats_r"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt_r")

    def push(rows):
        spark.createDataFrame(_beats_pdf(rows), schema=hb.HEARTBEAT_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(str(src))

    out_dir = str(tmp_path / "out_r")

    def start():
        # memory sinks don't support checkpoint recovery — use a file sink
        stream = spark.readStream.schema(hb.HEARTBEAT_SCHEMA).parquet(str(src))
        return (
            hb.track_worker_liveness(stream, idle_timeout_s=3600)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )

    def wait_rows(pred, timeout_s=120):
        deadline = time.time() + timeout_s
        rows = []
        while time.time() < deadline:
            try:
                rows = spark.read.schema(hb.REAPER_OUT_SCHEMA).parquet(out_dir).collect()
            except Exception:
                rows = []
            if pred(rows):
                return rows
            time.sleep(2)
        raise AssertionError(f"not reached; rows={rows}")

    push([("w1", 1000, "a", 5)])
    q = start()
    try:
        wait_rows(lambda rows: any(r["uuid"] == "w1" and r["n_beats"] == 1 for r in rows))
    finally:
        q.stop()

    # restart from the same checkpoint; new beats must ADD to restored state
    push([("w1", 1100, "b", 5)])
    q2 = start()
    try:
        rows = wait_rows(
            lambda rows: any(r["uuid"] == "w1" and r["n_beats"] == 2 for r in rows)
        )
        w1 = [r for r in rows if r["uuid"] == "w1" and r["n_beats"] == 2][0]
        assert w1["last_seen"] == 1100
    finally:
        q2.stop()


def test_counter_refresh_rate_limited_batch(spark):
    """S5 (main.py:811-820): many observations inside one 25 s poll
    window collapse to ONE refresh per key carrying the freshest value."""
    import datetime as dt

    base = dt.datetime(2021, 1, 1, 12, 0, 0)
    rows = [
        ("nl-pairs", 100, base),
        ("nl-pairs", 120, base + dt.timedelta(seconds=10)),  # freshest in w0
        ("nl-pairs", 110, base + dt.timedelta(seconds=5)),
        ("nl-pairs", 130, base + dt.timedelta(seconds=30)),  # w1
        ("pairs", 7, base + dt.timedelta(seconds=3)),
    ]
    obs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "value", "ts"]),
        schema=hb.COUNTER_OBS_SCHEMA,
    )
    out = {
        (r["key"], r["refresh_at"].second): r["value"]
        for r in hb.counter_refresh_stream(obs).collect()
    }
    assert out == {("nl-pairs", 25): 120, ("nl-pairs", 50): 130, ("pairs", 25): 7}


def test_counter_refresh_streaming_mode(spark, tmp_path):
    """The same op wired as readStream → memory sink emits the finalized
    window refreshes."""
    import datetime as dt

    base = dt.datetime(2021, 1, 1, 12, 0, 0)
    src = tmp_path / "obs"
    src.mkdir()
    pdf = pd.DataFrame(
        [
            ("nl-pairs", 100, base),
            ("nl-pairs", 150, base + dt.timedelta(seconds=20)),
            ("nl-pairs", 200, base + dt.timedelta(seconds=60)),
            # watermark-advancing tail event, its own window stays open
            ("nl-pairs", 999, base + dt.timedelta(seconds=300)),
        ],
        columns=["key", "value", "ts"],
    )
    spark.createDataFrame(pdf, schema=hb.COUNTER_OBS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(src))
    stream = spark.readStream.schema(hb.COUNTER_OBS_SCHEMA).parquet(str(src))
    q = (
        hb.counter_refresh_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("counter_refresh")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        # 25 s windows align to the epoch: [12:00:00,:25) and [:50,1:15)
        want = {(25, 150), (75, 200)}
        got = set()
        while time.time() < deadline and not want <= got:
            q.processAllAvailable()
            got = {
                (r["refresh_at"].minute * 60 + r["refresh_at"].second, r["value"])
                for r in spark.sql("SELECT * FROM counter_refresh").collect()
            }
            time.sleep(0.5)
        assert want <= got, got
    finally:
        q.stop()


def test_crawl_stream_two_batches_equals_two_rounds(spark, tmp_path):
    """r04 streaming crawl wiring: two micro-batches through
    run_crawl_stream — WITH a stop/restart between them (checkpoint
    resume) — commit exactly the state of two batch-mode CrawlEngine
    rounds: same per-round claim counts, same final seen-set."""
    from crawlingathome_server_spark import datagen
    from crawlingathome_server_spark.plans.rounds import CrawlEngine
    from crawlingathome_server_spark.sources.checkpoint import CheckpointStore
    from crawlingathome_server_spark.streaming.crawl import run_crawl_stream

    pages1 = datagen.pages(spark, seed=61, n=300)
    pages2 = datagen.pages(spark, seed=62, n=300)

    # batch reference: two rounds
    store_b = CheckpointStore(str(tmp_path / "batch"), n_partitions=4)
    eng_b = CrawlEngine(spark, store_b, seed=5, default_budget=1 << 20)
    eng_b.bootstrap()
    eng_b.run_round(pages1, round_epoch=1)
    eng_b.run_round(pages2, round_epoch=2)

    def claims_per_round(store):
        return [
            m["counters"]["n_claimed"]
            for m in reversed(store.lineage())
            if "n_claimed" in m.get("counters", {})
        ]

    # streaming: batch 1, drain, STOP; add batch 2; restart from checkpoint
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    store_s = CheckpointStore(str(tmp_path / "stream"), n_partitions=4)
    eng_s = CrawlEngine(spark, store_s, seed=5, default_budget=1 << 20)
    eng_s.bootstrap()
    pages1.coalesce(1).write.mode("append").parquet(src)
    q1 = run_crawl_stream(spark, eng_s, src, ckpt)
    assert q1.awaitTermination(180)
    assert claims_per_round(store_s) == claims_per_round(store_b)[:1]

    pages2.coalesce(1).write.mode("append").parquet(src)
    q2 = run_crawl_stream(spark, eng_s, src, ckpt)
    assert q2.awaitTermination(180)

    assert claims_per_round(store_s) == claims_per_round(store_b)
    seen_b = sorted(r["canon_url"] for r in store_b.read(spark, "seen_urls").collect())
    seen_s = sorted(r["canon_url"] for r in store_s.read(spark, "seen_urls").collect())
    assert seen_s == seen_b and len(seen_s) > 0
    # the stream rounds recorded their batch ids (exactly-once bookkeeping)
    last = store_s.read_manifest(store_s.latest_snapshot_id())["counters"]
    assert last["stream_batch_id"] == 1


def test_crawl_stream_batch_round_interleaved_keeps_replay_skip(spark, tmp_path):
    """ADVICE r04: a NON-stream CrawlEngine round committed between the
    store commit and the streaming checkpoint commit (the crash window)
    must not erase stream_batch_id — otherwise a replayed micro-batch
    double-applies. The counter now carries forward through batch
    rounds, and a replayed batch id is still skipped after one."""
    from crawlingathome_server_spark import datagen
    from crawlingathome_server_spark.plans.rounds import CrawlEngine
    from crawlingathome_server_spark.sources.checkpoint import CheckpointStore
    from crawlingathome_server_spark.streaming.crawl import run_crawl_stream

    pages1 = datagen.pages(spark, seed=63, n=200)
    pages_mid = datagen.pages(spark, seed=64, n=200)

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    store = CheckpointStore(str(tmp_path / "st"), n_partitions=4)
    eng = CrawlEngine(spark, store, seed=5, default_budget=1 << 20)
    eng.bootstrap()
    pages1.coalesce(1).write.mode("append").parquet(src)
    q = run_crawl_stream(spark, eng, src, ckpt)
    assert q.awaitTermination(180)
    assert (
        store.read_manifest(store.latest_snapshot_id())["counters"][
            "stream_batch_id"
        ]
        == 0
    )

    # interleave a batch-mode round: stream_batch_id must survive it
    eng.run_round(pages_mid, round_epoch=50)
    counters = store.read_manifest(store.latest_snapshot_id())["counters"]
    assert counters["stream_batch_id"] == 0

    # simulate the replay of batch 0 (crash before checkpoint commit):
    # wipe the streaming checkpoint so the SAME file re-delivers as
    # batch 0 — the manifest skip must reject it (no new store commit)
    import shutil

    shutil.rmtree(ckpt)
    snap_before = store.latest_snapshot_id()
    seen_before = sorted(
        r["canon_url"] for r in store.read(spark, "seen_urls").collect()
    )
    q2 = run_crawl_stream(spark, eng, src, ckpt)
    assert q2.awaitTermination(180)
    assert store.latest_snapshot_id() == snap_before
    seen_after = sorted(
        r["canon_url"] for r in store.read(spark, "seen_urls").collect()
    )
    assert seen_after == seen_before


def test_crawl_stream_live_trigger_feeds_mid_stream(spark, tmp_path):
    """VERDICT r04 next #6: a LIVE processingTime-trigger stream — files
    fed while the query runs, stopped after N rounds — commits the same
    manifest chain as batch mode, without relying on availableNow drain
    semantics."""
    import time

    from crawlingathome_server_spark import datagen
    from crawlingathome_server_spark.plans.rounds import CrawlEngine
    from crawlingathome_server_spark.sources.checkpoint import CheckpointStore
    from crawlingathome_server_spark.streaming.crawl import run_crawl_stream

    pages1 = datagen.pages(spark, seed=65, n=250)
    pages2 = datagen.pages(spark, seed=66, n=250)

    # batch reference
    store_b = CheckpointStore(str(tmp_path / "batch"), n_partitions=4)
    eng_b = CrawlEngine(spark, store_b, seed=5, default_budget=1 << 20)
    eng_b.bootstrap()
    eng_b.run_round(pages1, round_epoch=1)
    eng_b.run_round(pages2, round_epoch=2)

    def rounds_committed(store):
        return [
            (m["counters"]["n_claimed"], m["counters"].get("stream_batch_id"))
            for m in reversed(store.lineage())
            if "n_claimed" in m.get("counters", {})
        ]

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    store_s = CheckpointStore(str(tmp_path / "stream"), n_partitions=4)
    eng_s = CrawlEngine(spark, store_s, seed=5, default_budget=1 << 20)
    eng_s.bootstrap()
    pages1.coalesce(1).write.mode("append").parquet(src)
    q = run_crawl_stream(
        spark, eng_s, src, ckpt, available_now=False,
        trigger_interval="1 seconds",
    )
    try:
        deadline = time.time() + 180
        while time.time() < deadline and len(rounds_committed(store_s)) < 1:
            time.sleep(0.5)
        assert len(rounds_committed(store_s)) == 1, "round 1 never committed"
        # feed the second file MID-STREAM, while the query is live
        pages2.coalesce(1).write.mode("append").parquet(src)
        while time.time() < deadline and len(rounds_committed(store_s)) < 2:
            time.sleep(0.5)
        assert len(rounds_committed(store_s)) == 2, "round 2 never committed"
    finally:
        q.stop()

    assert [c for c, _ in rounds_committed(store_s)] == [
        c for c, _ in rounds_committed(store_b)
    ]
    assert [b for _, b in rounds_committed(store_s)] == [0, 1]
    seen_b = sorted(r["canon_url"] for r in store_b.read(spark, "seen_urls").collect())
    seen_s = sorted(r["canon_url"] for r in store_s.read(spark, "seen_urls").collect())
    assert seen_s == seen_b and len(seen_s) > 0


def test_crawl_stream_discovery_fetcher(spark, tmp_path):
    """r06: the streaming crawl drives the DISCOVERY loop too — a
    fetcher callback runs at each micro-batch start, drains the
    worklists the previous round committed, and this round ingests its
    results. Three one-file batches: batch 0 claims from a new host and
    queues its robots.txt; batch 1's fetcher returns the body (which
    advertises a sitemap); batch 2's fetcher returns the sitemap XML and
    the round claims its <loc> urls."""
    import datetime as dt

    from pyspark.sql import functions as F

    from crawlingathome_server_spark.plans.rounds import CrawlEngine
    from crawlingathome_server_spark.sources.checkpoint import CheckpointStore
    from crawlingathome_server_spark.streaming.crawl import run_crawl_stream

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    store = CheckpointStore(str(tmp_path / "disc_stream"), n_partitions=4)
    eng = CrawlEngine(
        spark, store, seed=5, default_budget=1 << 20, discovery=True
    )
    eng.bootstrap()

    def pages(urls):
        return spark.createDataFrame(
            [(u, dt.datetime(2021, 1, 1), None, None, None) for u in urls],
            schema="url string, warc_ts timestamp, html binary, "
            "text string, lang string",
        )

    # three files -> three micro-batches (maxFilesPerTrigger=1)
    pages(["http://hosta.example.com/p/1"]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    pages([]).coalesce(1).write.mode("append").parquet(src)
    pages([]).coalesce(1).write.mode("append").parquet(src)

    def fetcher(spark_, engine, batch_id):
        out = {}
        rq = engine.robots_worklist(spark_).collect()
        if rq:
            out["robots_fetched"] = spark_.createDataFrame(
                [
                    (r["host"], f"Sitemap: http://{r['host']}/sm.xml\n")
                    for r in rq
                ],
                schema="host string, robots_txt string",
            )
        sq = engine.sitemap_worklist(spark_).collect()
        if sq:
            out["sitemap_fetched"] = spark_.createDataFrame(
                [
                    (
                        s["sitemap_url"],
                        s["host"],
                        f"<urlset><url><loc>http://{s['host']}/from-sitemap"
                        f"</loc></url></urlset>",
                    )
                    for s in sq
                ],
                schema="sitemap_url string, host string, xml string",
            )
        return out

    q = run_crawl_stream(spark, eng, src, ckpt, fetcher=fetcher)
    assert q.awaitTermination(240)

    counters = store.read_manifest(store.latest_snapshot_id())["counters"]
    assert counters["n_robots_fetched"] == 0  # batch 2 fetched no robots
    seen = {
        r["canon_url"] for r in store.read(spark, "seen_urls").collect()
    }
    assert "http://hosta.example.com/from-sitemap" in seen
    assert "http://hosta.example.com/p/1" in seen
    # the dim table landed and persists
    dim = store.read(spark, CrawlEngine.ROBOTS_DIM).collect()
    assert [d["host"] for d in dim] == ["hosta.example.com"]
    # lineage records the discovery counters round by round
    per_round = {
        m["round_epoch"]: m["counters"]
        for m in store.lineage()
        if "n_robots_fetched" in m.get("counters", {})
    }
    assert per_round[2]["n_robots_fetched"] == 1
    assert per_round[2]["n_sitemaps_discovered"] == 1
    assert per_round[3]["n_sitemap_seeds"] == 1


def test_crawl_stream_curate_matches_batch(spark, tmp_path):
    """r07: curate=True composes with the streaming driver — two
    micro-batches (with a checkpoint restart between them) build exactly
    the corpus two batch rounds build, including cross-batch fingerprint
    dedup against the persisted corpus."""
    from crawlingathome_server_spark import datagen
    from crawlingathome_server_spark.plans.rounds import CrawlEngine
    from crawlingathome_server_spark.sources.checkpoint import CheckpointStore
    from crawlingathome_server_spark.streaming.crawl import run_crawl_stream

    pages1 = datagen.pages(spark, seed=71, n=200)
    # batch 2 re-serves 100 of batch 1's pages (same html → same
    # fingerprint → corpus dedup) plus 200 new ones
    pages2 = datagen.pages(spark, seed=71, n=300).subtract(
        datagen.pages(spark, seed=71, n=100)
    )

    def _engine(store):
        return CrawlEngine(
            spark, store, seed=5, default_budget=1 << 20,
            curate=True, curate_min_chars=10, curate_langs=None,
            curate_min_quality=0.0,
        )

    store_b = CheckpointStore(str(tmp_path / "batch"), n_partitions=4)
    eng_b = _engine(store_b)
    eng_b.bootstrap()
    eng_b.run_round(pages1, round_epoch=1)
    eng_b.run_round(pages2, round_epoch=2)
    corpus_b = sorted(
        (r["fingerprint"], r["canon_url"]) for r in eng_b.corpus().collect()
    )
    assert corpus_b

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    store_s = CheckpointStore(str(tmp_path / "stream"), n_partitions=4)
    eng_s = _engine(store_s)
    eng_s.bootstrap()
    pages1.coalesce(1).write.mode("append").parquet(src)
    q1 = run_crawl_stream(spark, eng_s, src, ckpt)
    assert q1.awaitTermination(180)
    pages2.coalesce(1).write.mode("append").parquet(src)
    q2 = run_crawl_stream(spark, eng_s, src, ckpt)
    assert q2.awaitTermination(180)

    corpus_s = sorted(
        (r["fingerprint"], r["canon_url"]) for r in eng_s.corpus().collect()
    )
    assert corpus_s == corpus_b
    last = store_s.read_manifest(store_s.latest_snapshot_id())["counters"]
    assert last["n_corpus_total"] == len(corpus_b)
