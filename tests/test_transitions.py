"""State-machine transition tests U1–U8 (SURVEY.md §2.8) including the
CPU→GPU two-stage path and the 'postgres' short-circuit."""

from pyspark.sql import functions as F

from crawlingathome_server_spark import datagen, schemas
from crawlingathome_server_spark.operators import aggregates as agg
from crawlingathome_server_spark.operators import transitions as tr


def _fresh(spark, n=300):
    from crawlingathome_server_spark.sources.seed import dedup_by_number

    return dedup_by_number(datagen.frontier(spark, n=n))


def test_u1_release(spark):
    fr = _fresh(spark)
    pending = fr.filter(F.col("pending") & ~F.col("closed")).select("number")
    n_pending = pending.count()
    fr2 = tr.release_claims(fr, pending)
    assert fr2.filter(F.col("pending") & ~F.col("closed")).count() == 0
    # released rows keep every other column
    assert fr2.count() == fr.count()
    assert n_pending > 0


def test_u2_hybrid_completion_closes(spark):
    fr = _fresh(spark)
    target = fr.filter(~F.col("closed") & ~F.col("gpu")).limit(5)
    comps = target.select(
        "number",
        F.lit("u1").alias("worker_uuid"),
        F.lit("alice").alias("nickname"),
        F.lit("hybrid").alias("kind"),
        F.lit(100).cast("long").alias("count"),
        F.lit(None).cast("string").alias("gpu_url"),
        F.lit(1).cast("long").alias("epoch"),
    )
    fr2 = tr.complete_jobs(fr, comps)
    done = fr2.join(target.select("number"), "number", "left_semi")
    assert done.filter(F.col("closed") & ~F.col("pending")).count() == 5
    assert done.filter(F.col("completor") == "alice").count() == 5


def test_u3_cpu_completion_promotes_to_gpu(spark):
    fr = _fresh(spark)
    target = fr.filter(~F.col("closed") & ~F.col("gpu")).limit(4)
    comps = target.select(
        "number",
        F.lit("u1").alias("worker_uuid"),
        F.lit("bob").alias("nickname"),
        F.lit("cpu").alias("kind"),
        F.lit(0).cast("long").alias("count"),
        F.concat(F.lit("https://art/"), F.col("number")).alias("gpu_url"),
        F.lit(1).cast("long").alias("epoch"),
    )
    fr2 = tr.complete_jobs(fr, comps)
    done = fr2.join(target.select("number"), "number", "left_semi")
    assert done.filter(F.col("gpu") & ~F.col("closed") & ~F.col("pending")).count() == 4
    assert done.filter(F.col("cpu_completor") == "bob").count() == 4


def test_u3_postgres_short_circuit(spark):
    """main.py:650-652: CPU result url containing 'postgres' closes the
    job immediately, skipping the GPU stage."""
    fr = _fresh(spark)
    target = fr.filter(~F.col("closed") & ~F.col("gpu")).limit(3)
    comps = target.select(
        "number",
        F.lit("u1").alias("worker_uuid"),
        F.lit("carol").alias("nickname"),
        F.lit("cpu").alias("kind"),
        F.lit(0).cast("long").alias("count"),
        F.lit("postgres://db/x").alias("gpu_url"),
        F.lit(1).cast("long").alias("epoch"),
    )
    fr2 = tr.complete_jobs(fr, comps)
    done = fr2.join(target.select("number"), "number", "left_semi")
    assert done.filter(F.col("closed") & ~F.col("gpu")).count() == 3
    assert done.filter(F.col("cpu_completor") == "carol").count() == 3
    # completor is untouched on the CPU path (main.py:646-653), even for
    # shortcut-closed jobs — it keeps the claim-time value.
    before = {r["number"]: r["completor"] for r in target.select("number", "completor").collect()}
    after = {r["number"]: r["completor"] for r in done.select("number", "completor").collect()}
    assert after == before


def test_u3_null_url_rejected(spark):
    """A CPU completion with NULL gpu_url is invalid (main.py:642-644
    rejects with 400) — the batch merge must drop it, not corrupt state."""
    fr = _fresh(spark)
    target = fr.filter(~F.col("closed") & ~F.col("gpu")).limit(3)
    comps = target.select(
        "number",
        F.lit("u1").alias("worker_uuid"),
        F.lit("eve").alias("nickname"),
        F.lit("cpu").alias("kind"),
        F.lit(0).cast("long").alias("count"),
        F.lit(None).cast("string").alias("gpu_url"),
        F.lit(1).cast("long").alias("epoch"),
    )
    fr2 = tr.complete_jobs(fr, comps)
    # the affected rows are unchanged, and nothing anywhere has NULL closed
    assert fr2.filter(F.col("closed").isNull()).count() == 0
    done = fr2.join(target.select("number"), "number", "left_semi")
    assert done.filter(F.col("closed") | F.col("gpu")).count() == 0


def test_completion_noop_on_closed(spark):
    fr = _fresh(spark)
    closed = fr.filter(F.col("closed")).limit(3)
    comps = closed.select(
        "number",
        F.lit("u1").alias("worker_uuid"),
        F.lit("mallory").alias("nickname"),
        F.lit("hybrid").alias("kind"),
        F.lit(5).cast("long").alias("count"),
        F.lit(None).cast("string").alias("gpu_url"),
        F.lit(1).cast("long").alias("epoch"),
    )
    fr2 = tr.complete_jobs(fr, comps)
    after = fr2.join(closed.select("number"), "number", "left_semi").collect()
    before = fr.join(closed.select("number"), "number", "left_semi").collect()
    key = lambda rs: sorted((r["number"], r["completor"], r["closed"]) for r in rs)  # noqa: E731
    assert key(after) == key(before)


def test_u5_gpu_invalid_download_reverts(spark):
    fr = _fresh(spark)
    target = fr.filter(F.col("gpu") & ~F.col("closed")).limit(3)
    fr2 = tr.gpu_invalid_download(fr, target.select("number"))
    back = fr2.join(target.select("number"), "number", "left_semi")
    assert back.filter(
        ~F.col("gpu") & F.col("gpu_url").isNull() & F.col("cpu_completor").isNull() & ~F.col("pending")
    ).count() == 3


def test_u6_heartbeat(spark):
    wk = datagen.workers(spark)
    beats = wk.limit(5).select(
        "uuid", F.lit("90%").alias("progress"), F.lit(999_999_999).cast("long").alias("epoch")
    )
    wk2 = tr.heartbeat(wk, beats)
    assert wk2.filter(F.col("last_seen") == 999_999_999).count() == 5
    assert wk2.filter(F.col("progress") == "90%").count() == 5


def test_u7_reaper_releases_then_deletes(spark):
    fr = _fresh(spark)
    wk = datagen.workers(spark)
    now = 1_600_100_000
    idle = wk.filter(F.col("last_seen") <= now - tr.IDLE_TIMEOUT_S)
    n_idle = idle.count()
    assert n_idle > 0
    fr2, wk2 = tr.reap_idle(fr, wk, now)
    assert wk2.count() == wk.count() - n_idle
    # the idle workers' shards are no longer pending (unless closed)
    shards = idle.filter(F.col("shard_number").isNotNull()).select(
        F.col("shard_number").alias("number")
    )
    still = fr2.join(shards, "number", "left_semi").filter(
        F.col("pending") & ~F.col("closed")
    )
    assert still.count() == 0


def test_u8_register_dedups(spark):
    wk = datagen.workers(spark, n=20)
    wk2 = tr.register_workers(wk, wk.limit(5))  # re-register = no-op
    assert wk2.count() == 20
    new = datagen.workers(spark, seed=99, n=3).withColumn(
        "uuid", F.concat(F.lit("new-"), F.col("uuid"))
    )
    assert tr.register_workers(wk, new).count() == 23


def test_leaderboard_merge_math(spark):
    lb = spark.createDataFrame(
        [("alice", 10, 1000), ("bob", 5, 500)], schema=schemas.LEADERBOARD
    )
    comps = datagen.completions(spark, n=100)
    lb2 = agg.leaderboard_merge(lb, comps)
    gold = {
        r["nickname"]: (r["jobs"], r["pairs"])
        for r in comps.filter(F.col("kind").isin("hybrid", "gpu"))
        .groupBy("nickname")
        .agg(F.count("*").alias("jobs"), F.sum("count").alias("pairs"))
        .collect()
    }
    out = {r["nickname"]: (r["jobs_completed"], r["pairs_scraped"]) for r in lb2.collect()}
    assert out["alice"][0] == 10 + gold.get("alice", (0, 0))[0]
    assert out["bob"][1] == 500 + gold.get("bob", (0, 0))[1]
    for nick, (j, p) in gold.items():
        if nick not in ("alice", "bob"):
            assert out[nick] == (j, p)
