"""State-machine transitions U1–U8 (SURVEY.md §2.8) as columnar merges.

The reference mutates one row per HTTP request (job.save()/client.save(),
main.py:416,547,646-653,676-679,713-717,736-759). Spark never writes
row-at-a-time: every transition is a *batch* join + ``when/otherwise``
rewrite of the affected columns, committed once per round. The generic
helper :func:`merge_update` is the engine's MERGE-INTO stand-in (no Iceberg
runtime jar in-sandbox — see sources/checkpoint.py for the snapshot layer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_update(
    base: DataFrame,
    delta: DataFrame,
    key: str,
    set_cols: dict[str, Column],
    delta_prefix: str = "d_",
) -> DataFrame:
    """``MERGE INTO base USING delta ON base.key=delta.key WHEN MATCHED
    UPDATE SET ...`` as a left join + conditional rewrite.

    ``delta`` columns are exposed to ``set_cols`` expressions with
    ``delta_prefix``; the match flag is ``__hit``. Result keeps exactly
    ``base``'s columns. ``delta`` must be unique on ``key``.
    """
    d = delta.select(
        *[F.col(c).alias(delta_prefix + c) for c in delta.columns]
    ).withColumn("__hit", F.lit(True))
    joined = base.join(d, base[key] == d[delta_prefix + key], "left")
    hit = F.coalesce(F.col("__hit"), F.lit(False))
    out_cols = []
    for c in base.columns:
        if c in set_cols:
            out_cols.append(F.when(hit, set_cols[c]).otherwise(base[c]).alias(c))
        else:
            out_cols.append(base[c])
    return joined.select(*out_cols)


# --- U1: release stale claims (main.py:545-547,552,577,736-738) ----------


def release_claims(frontier: DataFrame, numbers: DataFrame) -> DataFrame:
    """pending→false, completor→null for the given shard ``number`` set
    (only where not closed)."""
    return merge_update(
        frontier,
        numbers.select("number").dropDuplicates(["number"]),
        "number",
        {
            "pending": F.when(F.col("closed"), F.col("pending")).otherwise(F.lit(False)),
            "completor": F.when(F.col("closed"), F.col("completor")).otherwise(
                F.lit(None).cast("string")
            ),
        },
    )


# --- U2/U3: markAsDone (main.py:627-697) ----------------------------------


def complete_jobs(frontier: DataFrame, completions: DataFrame) -> DataFrame:
    """Apply a batch of completion events.

    - kind hybrid/gpu (U2, main.py:676-679): closed=T, pending=F,
      completor=nickname.
    - kind cpu (U3, main.py:646-653): gpu=T, pending=F, gpu_url set,
      cpu_completor=nickname — job becomes an open GPU job; EXCEPT the
      'postgres' short-circuit (P5, main.py:650-652): gpu_url containing
      'postgres' closes the job immediately, skipping the GPU stage.
      ``completor`` is never modified on the CPU path (main.py:646-653
      leaves the claim-time value in place, even for shortcut-closed
      jobs).

    Guards from main.py:637-640 (no shard / already closed) become join
    predicates: a completion for a closed or unknown number is a no-op.
    A CPU completion with NULL gpu_url is invalid input — the reference
    rejects it with HTTP 400 (main.py:642-644); here it is dropped
    before the merge so three-valued ``contains`` logic can never write
    a NULL ``closed`` flag.
    """
    d = completions.filter(
        ~((F.col("kind") == "cpu") & F.col("gpu_url").isNull())
    ).dropDuplicates(["number"])
    is_cpu = F.col("d_kind") == "cpu"
    shortcut = is_cpu & F.coalesce(F.col("d_gpu_url").contains("postgres"), F.lit(False))
    close_now = (~is_cpu) | shortcut
    return merge_update(
        frontier,
        d,
        "number",
        {
            "closed": F.when(F.col("closed"), F.lit(True)).otherwise(close_now),
            "pending": F.when(F.col("closed"), F.col("pending")).otherwise(F.lit(False)),
            "gpu": F.when(F.col("closed"), F.col("gpu")).otherwise(
                F.when(is_cpu & ~shortcut, F.lit(True)).otherwise(F.col("gpu"))
            ),
            "gpu_url": F.when(F.col("closed"), F.col("gpu_url")).otherwise(
                F.when(is_cpu, F.col("d_gpu_url")).otherwise(F.col("gpu_url"))
            ),
            "completor": F.when(F.col("closed"), F.col("completor")).otherwise(
                F.when(~is_cpu, F.col("d_nickname")).otherwise(F.col("completor"))
            ),
            "cpu_completor": F.when(F.col("closed"), F.col("cpu_completor")).otherwise(
                F.when(is_cpu, F.col("d_nickname")).otherwise(F.col("cpu_completor"))
            ),
        },
    )


# --- U4: admin batch markasdone (main.py:409-416,447-448) -----------------


def admin_mark_done(frontier: DataFrame, probe: DataFrame) -> DataFrame:
    """Set closed over ``number IN (...)`` with a per-number gpu_url map.

    The reference loops row-by-row (main.py:409-416); here one semi-join
    merge. ``probe``: (number, gpu_url nullable).
    """
    return merge_update(
        frontier,
        probe.dropDuplicates(["number"]),
        "number",
        {
            "closed": F.lit(True),
            "pending": F.lit(False),
            "gpu_url": F.coalesce(F.col("d_gpu_url"), F.col("gpu_url")),
        },
    )


# --- U5: gpuInvalidDownload revert (main.py:713-717) ----------------------


def gpu_invalid_download(frontier: DataFrame, numbers: DataFrame) -> DataFrame:
    """Revert a GPU-stage job back to open CPU stage.

    Closed jobs are untouchable: in the reference a completed shard is
    detached from its worker (``client.shard = None``, main.py:653,683),
    so gpuInvalidDownload (main.py:700-717, which requires the worker to
    still HOLD the shard) can never reach a closed job — the batch merge
    states that precondition explicitly (caught by the randomized
    engine-vs-simulator fuzz)."""
    keep = F.col("closed")
    return merge_update(
        frontier,
        numbers.select("number").dropDuplicates(["number"]),
        "number",
        {
            "gpu": F.when(keep, F.col("gpu")).otherwise(F.lit(False)),
            "gpu_url": F.when(keep, F.col("gpu_url")).otherwise(
                F.lit(None).cast("string")
            ),
            "cpu_completor": F.when(keep, F.col("cpu_completor")).otherwise(
                F.lit(None).cast("string")
            ),
            "pending": F.when(keep, F.col("pending")).otherwise(F.lit(False)),
        },
    )


# --- U6: progress heartbeat (main.py:620) ---------------------------------


def heartbeat(workers: DataFrame, beats: DataFrame) -> DataFrame:
    """``progress=..., last_seen=now`` merged into workers.
    ``beats``: (uuid, progress, epoch)."""
    return merge_update(
        workers,
        beats.dropDuplicates(["uuid"]),
        "uuid",
        {"progress": F.col("d_progress"), "last_seen": F.col("d_epoch")},
    )


# --- U7: idle reaper (main.py:748-759; timeout config.py:8) ---------------

IDLE_TIMEOUT_S = 7200


def reap_idle(
    frontier: DataFrame, workers: DataFrame, now_epoch: int
) -> tuple[DataFrame, DataFrame]:
    """Release shards of idle workers, then delete the workers.

    Returns (new_frontier, new_workers). Delete = left_anti (S4,
    main.py:759); release = U1 over the expired workers' shard numbers.
    """
    expired = workers.filter(F.col("last_seen") <= F.lit(now_epoch - IDLE_TIMEOUT_S))
    shard_numbers = expired.filter(F.col("shard_number").isNotNull()).select(
        F.col("shard_number").alias("number")
    )
    new_frontier = release_claims(frontier, shard_numbers)
    new_workers = workers.join(expired.select("uuid"), on="uuid", how="left_anti")
    return new_frontier, new_workers


# --- U8: worker registration (main.py:495-505) ----------------------------


def register_workers(workers: DataFrame, new_workers: DataFrame) -> DataFrame:
    """Append-only registration; duplicate uuids keep the existing row."""
    fresh = new_workers.join(workers.select("uuid"), on="uuid", how="left_anti")
    return workers.unionByName(fresh.select(*workers.columns))
