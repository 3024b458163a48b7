"""Physical-plan assertions — the 100 TB posture, checked in CI.

Each test pins a plan property that matters at scale: filters reaching
the parquet scan, column pruning, dim-side broadcast, map-side top-k
(WindowGroupLimit), no accidental cartesian products, whole-stage
codegen coverage. A regression here is a performance bug even when
results stay correct.
"""

import pytest
from pyspark.sql import functions as F

from crawlingathome_server_spark import datagen
from crawlingathome_server_spark.operators import claim
from crawlingathome_server_spark.sources.seed import dedup_by_number

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey")
    )
    p = plan_of(df)
    assert "PushedFilters" in p
    assert "EqualTo(o_orderstatus,O)" in p, p


def test_column_pruning_in_read_schema(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey")
    p = plan_of(df)
    # the scan must read exactly one column
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "o_orderkey" in read_schema
    assert "o_totalprice" not in read_schema, read_schema


def test_dim_join_broadcasts(spark):
    c = spark.read.parquet(f"{SF}/customer.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    df = o.join(c, o.o_custkey == c.c_custkey, "inner")
    p = plan_of(df)
    assert "BroadcastHashJoin" in p, p


def test_claim_literal_budget_gets_window_group_limit(spark):
    """Literal politeness budget → Catalyst's partial WindowGroupLimit
    bounds hot-host shuffle volume map-side (see operators/claim.py)."""
    fr = dedup_by_number(datagen.frontier(spark, n=200))
    claims = claim.claim_batch(fr, None, seed=1, default_budget=4, with_payload=False)
    p = plan_of(claims)
    assert "WindowGroupLimit" in p, p
    assert "Partial" in p, p


def test_claim_payload_join_is_broadcast(spark):
    fr = dedup_by_number(datagen.frontier(spark, n=200))
    claims = claim.claim_batch(fr, None, seed=1, default_budget=4)
    p = plan_of(claims)
    assert "BroadcastHashJoin" in p, p


def test_claim_robots_budget_uses_salted_two_phase(spark):
    fr = dedup_by_number(datagen.frontier(spark, n=200))
    rb = datagen.robots(spark)
    claims = claim.claim_batch(fr, rb, seed=1, with_payload=False)
    p = plan_of(claims)
    # two rank phases → two window operators over different partitionings
    assert p.count("Window") >= 2, p
    # the politeness dim join must be broadcast, not shuffled
    assert "BroadcastHashJoin" in p, p


def test_expand_frontier_has_no_cartesian(spark):
    from crawlingathome_server_spark.plans.rounds import expand_frontier

    pages = datagen.pages(spark, seed=3, n=100)
    rb = datagen.robots(spark)
    p = plan_of(expand_frontier(pages, rb, seed=1))
    assert "CartesianProduct" not in p, p


def test_expand_frontier_is_python_free(spark):
    """The flagship hot path (canonicalize → hash → dedup → claim) must
    never leave the JVM: at 10^10 URLs a pandas UDF here would be the
    engine's bottleneck (r01 verdict item #3)."""
    from crawlingathome_server_spark.plans.rounds import expand_frontier

    pages = datagen.pages(spark, seed=3, n=100)
    rb = datagen.robots(spark)
    p = plan_of(expand_frontier(pages, rb, seed=1))
    # follow_links=True adds href extraction — since r03 also JVM-side
    # (functions/text.extract_links_jvm), so the TRUE crawl loop
    # (links → canonicalize → dedup → claim) is Python-free end to end
    p_links = plan_of(expand_frontier(pages, rb, seed=1, follow_links=True))
    for marker in ("ArrowEvalPython", "BatchEvalPython", "PythonUDF", "FlatMapGroupsInPandas"):
        assert marker not in p, marker
        assert marker not in p_links, marker


def test_knn_cross_join_is_broadcast_not_cartesian(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as se

    df = se.queries()["sim_knn_cosine"](spark, SF)
    p = plan_of(df)
    assert "BroadcastNestedLoopJoin" in p, p
    assert "CartesianProduct" not in p, p


def test_lsh_pipelines_have_no_cartesian_and_cap_buckets(spark):
    """The near-dup/ANN pipelines must candidate via bucket equi-joins
    (never a cross join), and the minhash bucket cap must push map-side
    (WindowGroupLimit) so a boilerplate mega-bucket can't blow a task."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as se

    for q in ("dedup_minhash_lsh", "dedup_simhash", "sim_ann_lsh"):
        p = plan_of(se.queries()[q](spark, SF))
        assert "CartesianProduct" not in p, q
    from crawlingathome_server_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = dedup.minhash_signatures_expr(docs)
    p = plan_of(dedup.lsh_candidate_pairs(sigs))
    assert "WindowGroupLimit" in p, p


def test_whole_stage_codegen_covers_scalar_ops(spark):
    from crawlingathome_server_spark.functions import text as tx

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = docs.select(
        "doc_id", tx.lang_id(F.col("text")).alias("lang"), tx.quality_score(F.col("text")).alias("q")
    )
    p = plan_of(df)
    # formatted mode marks codegen'd operators with '*'
    assert "* Project" in p, p[:2000]
    # no python UDF in this path — stays JVM-side
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p[:2000]


def test_conditional_agg_is_single_scan(spark):
    """A1: the fused dashboard counts must be ONE pass — exactly one scan
    node, partial+final hash aggregate, no joins."""
    from crawlingathome_server_spark.operators.aggregates import frontier_stats

    fr = datagen.frontier(spark, n=100)
    p = plan_of(frontier_stats(fr))
    assert p.count("Scan ") <= 1, p
    assert "Join" not in p, p


def test_transitions_merge_is_single_join(spark):
    """U2 merge = one left join, no row-at-a-time artifacts."""
    from crawlingathome_server_spark.operators import transitions as tr

    fr = dedup_by_number(datagen.frontier(spark, n=100))
    comps = datagen.completions(spark, n=20)
    p = plan_of(tr.complete_jobs(fr, comps))
    assert p.count("Join") == 1 or "BroadcastHashJoin" in p, p


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Scale posture: frontier-shaped tables bucketed on the join key
    co-locate — the join plans with NO Exchange on either side (what the
    checkpoint layout gives a real cluster via Iceberg bucket transforms)."""
    import uuid

    db = f"bkt_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db}")
    try:
        fr = dedup_by_number(datagen.frontier(spark, n=400))
        fr.write.bucketBy(4, "number").sortBy("number").saveAsTable(f"{db}.frontier_b")
        fr.select("number", "priority").write.bucketBy(4, "number").sortBy(
            "number"
        ).saveAsTable(f"{db}.claims_b")
        a = spark.table(f"{db}.frontier_b")
        b = spark.table(f"{db}.claims_b")
        # force sort-merge (the at-scale join for two fact tables); the
        # bucketed layout must satisfy its distribution with no Exchange
        joined = a.hint("merge").join(b.withColumnRenamed("priority", "p2"), on="number")
        p = plan_of(joined)
        assert "SortMergeJoin" in p, p
        assert "Exchange" not in p, p
    finally:
        spark.sql(f"DROP DATABASE {db} CASCADE")


def test_point_read_prunes_base_scan_through_patch_layers(spark, tmp_path):
    """VERDICT r04 next #7: the narrow claim/merge point-read must prune
    the BASE parquet scan even while column-granular Patch layers are
    live — the merge-on-read reconstruction (window + join) must not
    drag the wide payload columns into the scan."""
    from crawlingathome_server_spark.plans.rounds import RoundEngine
    from crawlingathome_server_spark.sources.checkpoint import CheckpointStore

    store = CheckpointStore(str(tmp_path / "pr"), n_partitions=4)
    eng = RoundEngine(spark, store, seed=3)
    fr = dedup_by_number(datagen.frontier(spark, n=300))
    eng.bootstrap(fr, datagen.workers(spark), round_epoch=0)
    eng.run_round(round_epoch=1, frontier_commit="patch")  # 1 live layer
    assert (
        store.read_manifest(store.latest_snapshot_id())["tables"]["frontier"][
            "delta_layers"
        ]
    ), "test needs a live patch layer"

    keys = fr.limit(20).select("number")
    narrow = ("number", *RoundEngine.FRONTIER_STATE_COLS)
    df = store.read_buckets(spark, "frontier", keys, columns=narrow)
    p = plan_of(df)
    # every parquet scan in the reconstructed plan (base buckets + layer)
    # must read narrow schemas only — never the wide url payload
    schemas = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert schemas, p
    for ln in schemas:
        assert "url" not in ln.split("gpu_url")[0] and "host" not in ln, ln
    # and the open-set sidecar read is narrow by construction: its base
    # scan must carry exactly the sidecar columns
    sc = store.read(spark, RoundEngine.OPEN_SIDECAR)
    sc_schemas = [
        ln for ln in plan_of(sc).splitlines() if "ReadSchema" in ln
    ]
    assert sc_schemas
    for ln in sc_schemas:
        assert "pending" not in ln and "completor" not in ln, ln


def test_claim_over_host_bucketed_frontier_is_shuffle_free(spark, tmp_path):
    """r06 scale posture: the claim's only shuffle is the per-host rank
    exchange. A frontier that PERSISTS host_key and is stored BUCKETED
    on it (the layout an Iceberg bucket transform gives a real
    deployment) already satisfies the window's clustered distribution,
    so claim_batch itself — end to end, not a hand-built window — plans
    with ZERO Exchange: scan → sort within buckets → rank. At 10^10
    rows that turns the round's rank from a ~400 GB shuffle into an
    embarrassingly parallel scan. Also asserts the stored-host_key path
    returns exactly what the compute-the-hash path returns."""
    import uuid

    from crawlingathome_server_spark.functions.urls import seeded_hash64

    db = f"bkt_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db}")
    try:
        fr = dedup_by_number(datagen.frontier(spark, n=400)).withColumn(
            "host_key", seeded_hash64(F.col("host"))
        )
        fr.write.bucketBy(4, "host_key").saveAsTable(f"{db}.frontier_hb")
        t = spark.table(f"{db}.frontier_hb")
        claims = claim.claim_batch(
            t, None, seed=7, default_budget=4, with_payload=False
        )
        p = plan_of(claims)
        assert "WindowGroupLimit" in p, p
        assert "Exchange" not in p, p
        # value parity with the hash-computing path over the same rows
        plain = claim.claim_batch(
            t.drop("host_key"), None, seed=7, default_budget=4,
            with_payload=False,
        )
        assert sorted(map(tuple, claims.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql(f"DROP DATABASE {db} CASCADE")


def test_engine_claim_from_bucketed_store_snapshot_is_shuffle_free(spark, tmp_path):
    """VERDICT r06 next #1 done-criterion: the claim must be shuffle-free
    END-TO-END THROUGH THE STORE, not just over an ad-hoc bucketBy
    table. RoundEngine.bootstrap persists host_key on the frontier and
    registers a host_key bucket layout for the open sidecar; the store
    writes the sidecar via bucketBy + a catalog registration, so a claim
    over a store SNAPSHOT read plans with zero Exchange (the ~400 GB
    rank shuffle at 10^10 rows becomes an embarrassingly parallel
    scan)."""
    from crawlingathome_server_spark.plans.rounds import RoundEngine
    from crawlingathome_server_spark.sources.checkpoint import CheckpointStore

    store = CheckpointStore(str(tmp_path / "bk"), n_partitions=4)
    eng = RoundEngine(spark, store, seed=5)
    fr = dedup_by_number(datagen.frontier(spark, n=500))
    eng.bootstrap(fr, datagen.workers(spark), round_epoch=0)
    meta = store.read_manifest(store.latest_snapshot_id())["tables"][
        RoundEngine.OPEN_SIDECAR
    ]
    assert meta["bucket_layout"]["col"] == "host_key"
    parts = store.read_parts(spark, RoundEngine.OPEN_SIDECAR)
    assert len(parts) == 1  # no layers yet: the catalog bucketed base
    claim_input = parts[0].withColumn("pending", F.lit(False)).withColumn(
        "closed", F.lit(False)
    )
    claims = claim.claim_batch_union(
        [claim_input], None, seed=9, default_budget=4
    )
    p = plan_of(claims)
    assert "WindowGroupLimit" in p, p
    assert "Exchange" not in p, p
    assert "Bucketed: true" in p, p

    # per-host COLUMN budgets (robots dim): the budget attaches via a
    # broadcast join and the salted two-phase rank still never
    # re-partitions by host_key — zero shuffle with politeness budgets
    rb = spark.createDataFrame(
        [("example-0.com", 2)], "host string, max_claims_per_round int"
    )
    claims_rb = claim.claim_batch_union(
        [claim_input], rb, seed=9, default_budget=4
    )
    prb = plan_of(claims_rb)
    assert "Exchange hashpartitioning(host_key" not in prb, prb
    assert "Exchange hashpartitioning(salt" not in prb, prb

    # catalog-loss resilience: a FRESH session (catalog wiped) re-registers
    # the external CLUSTERED BY table from manifest metadata alone
    spark.sql(f"DROP DATABASE IF EXISTS {store._catalog_db()} CASCADE")
    again = store.read(spark, RoundEngine.OPEN_SIDECAR)
    assert "Bucketed: true" in plan_of(
        again.withColumn("x", F.lit(1))
        .groupBy("host_key")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_sidecar_claim_with_live_layers_shuffles_only_winners(spark, tmp_path):
    """VERDICT r06 next #7 composite: the O(open) sidecar claim and the
    bucketed layout must COMPOSE. With live merge-on-read layers the
    engine claims via read_parts + claim_batch_union: the huge bucketed
    base part ranks with ZERO host_key Exchange (broadcast anti-join
    preserves the bucketing), and only the pre-ranked survivors —
    O(winners) — plus the O(touched) layer part meet the final re-rank
    exchange. Also asserts the decomposition is EXACT vs the monolithic
    claim over the unioned input."""
    from crawlingathome_server_spark.operators.claim import _ranked_narrow, open_jobs
    from crawlingathome_server_spark.plans.rounds import RoundEngine
    from crawlingathome_server_spark.sources.checkpoint import CheckpointStore

    store = CheckpointStore(str(tmp_path / "bk2"), n_partitions=4)
    eng = RoundEngine(spark, store, seed=7)
    fr = dedup_by_number(datagen.frontier(spark, n=600))
    eng.bootstrap(fr, datagen.workers(spark), round_epoch=0)
    eng.run_round(round_epoch=1, frontier_commit="patch")  # 1 live sidecar layer
    meta = store.read_manifest(store.latest_snapshot_id())["tables"][
        RoundEngine.OPEN_SIDECAR
    ]
    assert meta["delta_layers"], "test needs a live sidecar layer"
    parts = store.read_parts(spark, RoundEngine.OPEN_SIDECAR)
    assert len(parts) == 2
    flagged = [
        p.withColumn("pending", F.lit(False)).withColumn("closed", F.lit(False))
        for p in parts
    ]
    # the base part's pre-rank: bucketed scan, no host_key/salt exchange
    pre = _ranked_narrow(
        flagged[0].filter(open_jobs(flagged[0])),
        None,
        seed=3,
        default_budget=4,
        salt_buckets=8,
        host_col="host",
        use_oracle_hash=False,
    )
    p = plan_of(pre)
    assert "Bucketed: true" in p, p
    assert "Exchange hashpartitioning(host_key" not in p, p
    # exactness: decomposed == monolithic over the same union
    a = claim.claim_batch_union(flagged, None, seed=3, default_budget=4)
    b = claim.claim_batch(
        flagged[0].unionByName(flagged[1]),
        None,
        seed=3,
        default_budget=4,
        with_payload=False,
    )
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.select(*a.columns).collect())
    )
    # ... and with per-host robots budgets (the salted two-phase path)
    rb = datagen.robots_dim(spark) if hasattr(datagen, "robots_dim") else None
    if rb is None:
        rb = spark.createDataFrame(
            [("example-1.com", 1), ("example-2.com", 3)],
            "host string, max_claims_per_round int",
        )
    a2 = claim.claim_batch_union(flagged, rb, seed=3, default_budget=4)
    b2 = claim.claim_batch(
        flagged[0].unionByName(flagged[1]),
        rb,
        seed=3,
        default_budget=4,
        with_payload=False,
    )
    assert sorted(map(tuple, a2.collect())) == sorted(
        map(tuple, b2.select(*a2.columns).collect())
    )


def test_curate_probe_path_never_shuffles_corpus(spark, tmp_path):
    """r07 scale posture: the filter-first cross-round dedup scans the
    corpus but never SHUFFLES it — every join in the probe path is an
    explicit-broadcast BroadcastHashJoin (corpus-bucket point-read
    semi-joined against the broadcast probe-positives; docs anti-joined
    against the broadcast confirmed dups). The exchanges that remain
    are O(round docs): the dedup window and the probe cogroup. A
    SortMergeJoin or a hash-partition exchange fed by the corpus scan
    appearing here would mean an O(corpus) shuffle snuck back in."""
    import datetime as dt

    from crawlingathome_server_spark.plans.rounds import CrawlEngine
    from crawlingathome_server_spark.sources.checkpoint import CheckpointStore

    ts = dt.datetime(2021, 1, 1)
    html = (
        "<html><body><p>"
        + "the quick brown fox jumps over the lazy dog and that is fine " * 4
        + "</p></body></html>"
    )
    store = CheckpointStore(str(tmp_path / "probeplan"), n_partitions=4)
    eng = CrawlEngine(
        spark, store, seed=3, default_budget=1 << 20,
        curate=True, curate_min_chars=50,
        curate_filter_min_corpus=0,  # probe path from round 2 onward
    )
    eng.bootstrap()
    pages1 = spark.createDataFrame(
        [("http://a.example.com/one", ts, html)],
        schema="url string, warc_ts timestamp, html string",
    )
    eng.run_round(pages1, round_epoch=1)

    counters = store.read_manifest(store.latest_snapshot_id())["counters"]
    flt = store.read(spark, CrawlEngine.CORPUS_FILTER)
    pages2 = spark.createDataFrame(
        [("http://a.example.com/two", ts, html.replace("fox", "elk"))],
        schema="url string, warc_ts timestamp, html string",
    )
    docs, handles = eng._curate_pages(
        pages2, 2,
        store.read_manifest(store.latest_snapshot_id())["tables"],
        corpus_filter=(flt, counters["corpus_params"]),
    )
    try:
        p = plan_of(docs)
    finally:
        for h in handles:
            h.unpersist()
    assert "SortMergeJoin" not in p, p
    # both corpus-touching joins are pinned broadcasts
    assert p.count("BroadcastHashJoin") >= 2, p
    # LeftAnti (docs vs dup fps) and LeftSemi (corpus read vs positives)
    assert "LeftAnti" in p and "LeftSemi" in p, p
