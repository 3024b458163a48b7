"""Aggregations A1–A6 + top-k O1/O2 (SURVEY.md §2.4, §2.5).

The reference renders its dashboard with ~6 separate COUNT queries plus
3 top-50 scans per page (main.py:96-112) and papers over the cost with a
30 s Redis cache. Here the whole dashboard is ONE conditional-aggregation
pass over the frontier plus one window pass over workers — the fusion is
free in the DataFrame API and scales as a single shuffle-less scan
(partial aggregation map-side, tiny exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cnt(cond) -> F.Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def frontier_stats(frontier: DataFrame) -> DataFrame:
    """A1+A2 fused: every dashboard count in one scan
    (reference issues one query each: main.py:96-97,256-261,785-798)."""
    p, c, g = F.col("pending"), F.col("closed"), F.col("gpu")
    return frontier.agg(
        F.count(F.lit(1)).alias("total_jobs"),
        _cnt(c).alias("completed_jobs"),
        _cnt(~c & ~p & ~g).alias("open_cpu_jobs"),
        _cnt(~c & ~p & g).alias("open_gpu_jobs"),
        _cnt(~c & p).alias("pending_jobs"),
    ).select(
        "*",
        F.when(
            F.col("total_jobs") > 0,
            F.col("completed_jobs") * 100.0 / F.col("total_jobs"),
        )
        .otherwise(F.lit(100.0))
        .alias("completion_pct"),
    )


def worker_counts(workers: DataFrame) -> DataFrame:
    """Per-type active-worker counts (main.py:110-112) in one pass."""
    return workers.groupBy("type").agg(F.count(F.lit(1)).alias("n_workers"))


def top_workers_per_type(workers: DataFrame, k: int = 50) -> DataFrame:
    """O1: the 3 per-type ``ORDER BY first_seen LIMIT 50`` scans
    (main.py:102-108) as one window pass."""
    w = Window.partitionBy("type").orderBy(F.asc("first_seen"), F.asc("uuid"))
    return (
        workers.withColumn("rank_in_type", F.row_number().over(w))
        .filter(F.col("rank_in_type") <= k)
    )


def leaderboard_sorted(leaderboard: DataFrame) -> DataFrame:
    """O2: leaderboard ORDER BY jobs_completed DESC (main.py:196-197)."""
    return leaderboard.orderBy(F.desc("jobs_completed"), F.asc("nickname"))


def leaderboard_merge(
    leaderboard: DataFrame, completions: DataFrame, kind_filter: tuple[str, ...] = ("hybrid", "gpu")
) -> DataFrame:
    """A3+J5: grouped completion deltas upserted into the leaderboard.

    Reference does per-event get_or_create + increment
    (main.py:428-435,451-460,661-667,687-694); here one groupBy + one
    full-outer merge — the Iceberg MERGE INTO shape.
    """
    delta = (
        completions.filter(F.col("kind").isin(*kind_filter))
        .groupBy("nickname")
        .agg(
            F.count(F.lit(1)).cast("long").alias("d_jobs"),
            F.sum("count").cast("long").alias("d_pairs"),
        )
    )
    return (
        leaderboard.join(delta, on="nickname", how="full_outer")
        .select(
            "nickname",
            (F.coalesce(F.col("jobs_completed"), F.lit(0)) + F.coalesce(F.col("d_jobs"), F.lit(0)))
            .cast("long")
            .alias("jobs_completed"),
            (F.coalesce(F.col("pairs_scraped"), F.lit(0)) + F.coalesce(F.col("d_pairs"), F.lit(0)))
            .cast("long")
            .alias("pairs_scraped"),
        )
    )


def worker_counters_merge(workers: DataFrame, completions: DataFrame) -> DataFrame:
    """A4: per-worker jobs_completed increments (main.py:422-424,657,683)."""
    delta = completions.groupBy(F.col("worker_uuid").alias("uuid")).agg(
        F.count(F.lit(1)).cast("long").alias("d_jobs")
    )
    return (
        workers.join(delta, on="uuid", how="left")
        .withColumn(
            "jobs_completed",
            (F.col("jobs_completed") + F.coalesce(F.col("d_jobs"), F.lit(0))).cast("long"),
        )
        .drop("d_jobs")
    )


# --- A5: sliding-window ETA (main.py:762-808; config.py:11-12) ------------

AVERAGE_INTERVAL_S = 900
AVERAGE_DATASET_LENGTH = 10


def eta_estimate(
    interval_counts: DataFrame,
    *,
    remaining_col: str = "remaining",
    window_len: int = AVERAGE_DATASET_LENGTH,
    interval_s: int = AVERAGE_INTERVAL_S,
) -> DataFrame:
    """Reference keeps a max-10 deque of (closed_now − closed_15min_ago)
    and divides the mean by 900 s → jobs/s → ETA = remaining // rate.

    ``interval_counts``: one row per interval with (epoch:long,
    closed_cumulative:long, remaining:long). ``lag`` diffs the cumulative
    count; a rows-window of 10 takes the sliding mean.
    """
    w_order = Window.orderBy("epoch")
    w_slide = w_order.rowsBetween(-(window_len - 1), 0)
    return (
        interval_counts.withColumn(
            "delta",
            F.col("closed_cumulative")
            - F.lag("closed_cumulative", 1).over(w_order),
        )
        .withColumn("mean_delta", F.avg("delta").over(w_slide))
        .withColumn("jobs_per_s", F.col("mean_delta") / F.lit(float(interval_s)))
        .withColumn(
            "eta_s",
            F.when(
                F.col("jobs_per_s") > 0,
                F.floor(F.col(remaining_col) / F.col("jobs_per_s")),
            ).otherwise(F.lit(None).cast("long")),
        )
    )


def worker_efficiency(workers: DataFrame) -> DataFrame:
    """A6: jobs/hour KPI (templates/worker.html:37)."""
    return workers.select(
        "uuid",
        "jobs_completed",
        F.when(
            F.col("last_seen") > F.col("first_seen"),
            F.col("jobs_completed")
            / (F.col("last_seen") - F.col("first_seen")).cast("double")
            * 3600.0,
        )
        .otherwise(F.lit(0.0))
        .alias("shards_per_hour"),
    )


def humanize_duration(seconds: F.Column) -> F.Column:
    """F4: divmod y/d/h/m/s chain (main.py:765-780) as one projection."""
    # floor-divide (not cast of a double division): Spark's double→long cast
    # truncates while classic SQL CAST rounds — floor() is unambiguous in both.
    s = seconds.cast("long")
    years = F.floor(s / F.lit(31536000)).cast("long")
    days = F.floor((s % 31536000) / F.lit(86400)).cast("long")
    hours = F.floor((s % 86400) / F.lit(3600)).cast("long")
    minutes = F.floor((s % 3600) / F.lit(60)).cast("long")
    secs = s % 60
    return F.concat_ws(
        " ",
        F.when(years > 0, F.concat(years.cast("string"), F.lit("y"))),
        F.when(days > 0, F.concat(days.cast("string"), F.lit("d"))),
        F.when(hours > 0, F.concat(hours.cast("string"), F.lit("h"))),
        F.when(minutes > 0, F.concat(minutes.cast("string"), F.lit("m"))),
        F.concat(secs.cast("string"), F.lit("s")),
    )


def relative_time(elapsed_s: F.Column) -> F.Column:
    """F5: '<n> <unit>[s] ago' relative-time humanize — the dashboard's
    timeDifference (reference cdn/main.js:1-64) as one projection.

    Tier thresholds and Math.round semantics match the JS exactly
    (round-half-up on positive values is identical in JS, Spark, and
    DuckDB). One deliberate deviation: the reference's months branch
    pluralizes as ' month ago' even for n>1 (cdn/main.js:47-52, a typo);
    we pluralize correctly and note it here for the parity audit.
    """
    e = elapsed_s.cast("long")

    def fmt(n: F.Column, unit: str) -> F.Column:
        n = n.cast("long")
        return F.concat(
            n.cast("string"),
            F.lit(f" {unit}"),
            F.when(n == 1, F.lit("")).otherwise(F.lit("s")),
            F.lit(" ago"),
        )

    def rounded(div: int) -> F.Column:
        return F.round(e / F.lit(float(div)), 0)

    return (
        F.when(e < 60, fmt(e, "second"))
        .when(e < 3600, fmt(rounded(60), "minute"))
        .when(e < 86400, fmt(rounded(3600), "hour"))
        .when(e < 2592000, fmt(rounded(86400), "day"))
        .when(e < 31536000, fmt(rounded(2592000), "month"))
        .otherwise(fmt(rounded(31536000), "year"))
    )


def relative_time_sql(expr: str) -> str:
    """DuckDB twin of :func:`relative_time` (same tiers + rounding)."""

    def fmt(n: str, unit: str) -> str:
        return (
            f"concat(CAST({n} AS VARCHAR), ' {unit}', "
            f"CASE WHEN {n} = 1 THEN '' ELSE 's' END, ' ago')"
        )

    def rounded(div: int) -> str:
        return f"CAST(round(({expr}) / {div}.0) AS BIGINT)"

    return (
        f"CASE WHEN {expr} < 60 THEN {fmt(f'CAST({expr} AS BIGINT)', 'second')} "
        f"WHEN {expr} < 3600 THEN {fmt(rounded(60), 'minute')} "
        f"WHEN {expr} < 86400 THEN {fmt(rounded(3600), 'hour')} "
        f"WHEN {expr} < 2592000 THEN {fmt(rounded(86400), 'day')} "
        f"WHEN {expr} < 31536000 THEN {fmt(rounded(2592000), 'month')} "
        f"ELSE {fmt(rounded(31536000), 'year')} END"
    )
