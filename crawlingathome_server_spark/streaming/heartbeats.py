"""Structured-Streaming variants of the reference's daemon loops
(SURVEY.md §2.10): the polling loops become streams.

- T1 idle reaper (main.py:748-759, 300 s loop, 7200 s timeout):
  ``applyInPandasWithState`` over heartbeat events keyed by worker uuid
  with a processing-time timeout — a timed-out state emits a 'reaped'
  row (the reference deletes the Client row; same semantics).
- T2 ETA estimator (main.py:762-808, 900 s loop, deque of 10):
  sliding event-time window over completion events with a watermark —
  ``window(ts, '150 minutes', '15 minutes')`` mirrors deque length ×
  interval.
- T3 counter refresh (main.py:811-820): a rate-limited side input; in
  batch tests a static counters table (see schemas.COUNTERS).

Batch-mode equivalents (same logic, finite input) are provided for the
pytest suite; the streaming wiring itself is exercised with the
file/memory sources in tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

IDLE_TIMEOUT_S = 7200  # reference config.py:8
REAP_POLL_S = 300  # reference main.py:746

HEARTBEAT_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("progress", T.StringType(), True),
        T.StructField("shard_number", T.LongType(), True),
    ]
)

WORKER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_seen", T.LongType(), True),
        T.StructField("n_beats", T.LongType(), True),
        T.StructField("shard_number", T.LongType(), True),
    ]
)

REAPER_OUT_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("event", T.StringType(), False),  # alive | reaped
        T.StructField("last_seen", T.LongType(), True),
        T.StructField("n_beats", T.LongType(), True),
        T.StructField("shard_number", T.LongType(), True),  # to release on reap
    ]
)


def track_worker_liveness(
    heartbeats: DataFrame,
    *,
    idle_timeout_s: int = IDLE_TIMEOUT_S,
) -> DataFrame:
    """Stateful heartbeat tracker (works on a stream or a batch DF).

    Streaming: ``heartbeats`` from ``readStream`` → per-uuid state with a
    ProcessingTimeTimeout of ``idle_timeout_s``; a timeout emits the
    'reaped' row carrying the shard to release (U1+S4 as a stream).
    """

    def update(
        key: tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uuid,) = key
        if state.hasTimedOut:
            last_seen, n_beats, shard = state.get if state.exists else (None, None, None)
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "uuid": uuid,
                        "event": "reaped",
                        "last_seen": last_seen,
                        "n_beats": n_beats,
                        "shard_number": shard,
                    }
                ]
            )
            return
        last_seen, n_beats, shard = (
            state.get if state.exists else (0, 0, None)
        )
        for pdf in pdfs:
            if len(pdf):
                last_seen = max(int(last_seen or 0), int(pdf["epoch"].max()))
                n_beats = int(n_beats or 0) + len(pdf)
                live_shards = pdf["shard_number"].dropna()
                if len(live_shards):
                    shard = int(live_shards.iloc[-1])
        state.update((last_seen, n_beats, shard))
        state.setTimeoutDuration(idle_timeout_s * 1000)
        yield pd.DataFrame(
            [
                {
                    "uuid": uuid,
                    "event": "alive",
                    "last_seen": last_seen,
                    "n_beats": n_beats,
                    "shard_number": shard,
                }
            ]
        )

    return heartbeats.groupBy("uuid").applyInPandasWithState(
        update,
        outputStructType=REAPER_OUT_SCHEMA,
        stateStructType=WORKER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def eta_stream(
    completions: DataFrame,
    *,
    interval: str = "15 minutes",
    window_len: int = 10,
) -> DataFrame:
    """T2 as an event-time sliding window: completions per interval,
    averaged over the last ``window_len`` intervals → jobs/s.

    ``completions`` needs an event-time column ``ts``; late events beyond
    one interval are dropped by the watermark (the reference's deque also
    never revises past samples)."""
    total_minutes = int(interval.split()[0]) * window_len
    return (
        completions.withWatermark("ts", interval)
        .groupBy(F.window("ts", f"{total_minutes} minutes", interval))
        .agg(F.count(F.lit(1)).alias("n_completed"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col("n_completed"),
            (F.col("n_completed") / F.lit(float(total_minutes * 60))).alias("jobs_per_s"),
        )
    )


def counters_snapshot(counters: DataFrame, now_epoch: int) -> DataFrame:
    """S6/T3: the Redis page-cache/counter semantics as a freshness
    predicate over an epoch-keyed snapshot table (cache.py:22-39)."""
    return counters.filter(F.col("expires") > F.lit(now_epoch))


COUNTER_OBS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def counter_refresh_stream(
    observations: DataFrame, *, poll_interval: str = "25 seconds"
) -> DataFrame:
    """S5: the rate-limited external-counter poll (main.py:811-820 —
    every 25 s, GET the external tracker, cache the freshest value per
    key) as a stream: observations arrive at any rate; at most ONE
    refresh per key per poll interval is emitted, the freshest
    observation in the window winning (``max_by(value, ts)``). Works
    unchanged on a finite batch DF (the pytest twin)."""
    return (
        observations.withWatermark("ts", poll_interval)
        .groupBy(F.window("ts", poll_interval).alias("w"), "key")
        .agg(F.max_by("value", "ts").alias("value"), F.max("ts").alias("observed_ts"))
        .select("key", "value", F.col("w.end").alias("refresh_at"))
    )


def run_heartbeat_stream(
    spark,
    source_dir: str,
    checkpoint_dir: str,
    *,
    idle_timeout_s: int = IDLE_TIMEOUT_S,
    query_name: str = "worker_liveness",
) -> Any:
    """Wire the liveness tracker as a real file-source stream → memory
    sink (tests drive it with processAllAvailable)."""
    stream = (
        spark.readStream.schema(HEARTBEAT_SCHEMA)
        .parquet(source_dir)
    )
    tracked = track_worker_liveness(stream, idle_timeout_s=idle_timeout_s)
    return (
        tracked.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
