"""Streaming crawl loop: CrawlEngine rounds driven by a page stream.

The reference's crawl is a pull loop — workers poll the HTTP server for
jobs as shards land (main.py:533-598). Structured Streaming inverts it:
crawled pages arrive as a stream; each micro-batch IS one deterministic
CrawlEngine round (frontier expansion → politeness claim → seen-set +
filter delta-commit through the snapshot store), so the crawl keeps all
its batch-mode properties — exact resume, O(delta) commits, seeded
determinism — while running continuously.

Exactly-once across restarts: Structured Streaming replays the last
uncommitted micro-batch after a crash; the driver function skips any
``batch_id`` the store's manifest already records (the classic
transactional-sink idempotency pattern — the manifest is the
transaction log). Round epochs are derived from the checkpointed batch
id, so a resumed stream continues the SAME round sequence and produces
the state an uninterrupted run would have (pytest-asserted ≡ two
batch-mode rounds, including a stop/restart between batches).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def run_crawl_stream(
    spark: SparkSession,
    engine,
    source_dir: str,
    checkpoint_dir: str,
    *,
    robots: DataFrame | None = None,
    epoch_base: int = 0,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    trigger_interval: str | None = None,
    fetcher=None,
) -> Any:
    """Wire a parquet page stream into ``engine`` (a CrawlEngine whose
    store is already bootstrapped). One micro-batch = one crawl round
    with ``round_epoch = epoch_base + batch_id + 1``.

    ``available_now=True`` drains everything currently in ``source_dir``
    (respecting ``max_files_per_trigger`` per batch) and stops — the
    test/catch-up mode; ``False`` keeps the query live for continuous
    ingestion, firing on Spark's ASAP trigger or, when
    ``trigger_interval`` is given (e.g. ``"1 seconds"``), on a
    processingTime cadence — the deployment mode where pages keep
    landing while the crawl runs. Returns the StreamingQuery.

    ``fetcher`` (r06, discovery engines): a callable
    ``(spark, engine, batch_id) -> dict`` invoked at the START of each
    micro-batch, returning optional ``robots_fetched`` (host,
    robots_txt) and ``sitemap_fetched`` (sitemap_url, host, xml)
    DataFrames — the caller's fetch results for the worklists the
    PREVIOUS round committed (read them via ``engine.robots_worklist``/
    ``engine.sitemap_worklist``). The batch's round then ingests them
    exactly like batch mode: robots rules govern this round's claim,
    leaf sitemap locs seed this round's frontier. Replayed batches skip
    the round entirely, fetcher included (exactly-once holds)."""
    from .. import schemas

    pages = (
        spark.readStream.schema(schemas.PAGES)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        store = engine.store
        counters = store.read_manifest(store.latest_snapshot_id())["counters"]
        last = counters.get("stream_batch_id")
        if last is not None and batch_id <= last:
            return  # replayed after restart — this round already committed
        fetched = fetcher(spark, engine, batch_id) if fetcher is not None else {}
        engine.run_round(
            batch_df,
            round_epoch=epoch_base + batch_id + 1,
            robots=robots,
            extra_counters={"stream_batch_id": batch_id},
            robots_fetched=fetched.get("robots_fetched"),
            sitemap_fetched=fetched.get("sitemap_fetched"),
        )

    writer = pages.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_interval is not None:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
