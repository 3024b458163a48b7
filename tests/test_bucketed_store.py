"""CheckpointStore bucketed-layout unit tests (r07, VERDICT r06 next #1).

The layout is the in-sandbox analogue of an Iceberg ``bucket(N, col)``
partition transform: full writes cluster the table on the declared
column via ``bucketBy`` + an external catalog registration, so reads
carry ``HashPartitioning(col)`` into planning. These tests pin the
manifest lifecycle around that: Patch stacking, delta refusal,
carry-forward, snapshot expiry, and reopen adoption.
"""

import functools
import os

import pytest
from pyspark.sql import functions as F

from crawlingathome_server_spark.sources.checkpoint import (
    Append,
    CheckpointStore,
    Patch,
    UNCHANGED,
)


def _side(spark, n=200, hosts=13):
    return spark.range(n).select(
        F.col("id").alias("number"),
        F.concat(F.lit("h"), (F.col("id") % hosts).cast("string")).alias("host"),
        (F.col("id") % 5).cast("int").alias("priority"),
        F.xxhash64(
            F.concat(F.lit("h"), (F.col("id") % hosts).cast("string")), F.lit(0)
        ).alias("host_key"),
    )


def test_layout_roundtrip_patch_and_parts(spark, tmp_path):
    st = CheckpointStore(
        str(tmp_path / "st"), n_partitions=4, bucket_layouts={"side": ("host_key", 4)}
    )
    df = _side(spark)
    st.commit({"side": df}, seed=1, round_epoch=0)
    assert st.read(spark, "side").count() == 200
    m = st.read_manifest(st.latest_snapshot_id())["tables"]["side"]
    assert m["bucket_layout"]["n"] == 4 and m["total_rows"] == 200

    upd = df.filter(F.col("number") < 3).withColumn("priority", F.lit(9))
    rm = df.filter(F.col("number") < 10).select("number")
    st.commit(
        {"side": df},
        seed=1,
        round_epoch=1,
        deltas={"side": Patch(upd, remove_keys=rm, upsert=True, rows_delta=-7)},
    )
    r = st.read(spark, "side")
    assert r.count() == 193
    assert r.filter(F.col("number") == 1).select("priority").first()[0] == 9
    parts = st.read_parts(spark, "side")
    assert len(parts) == 2
    un = functools.reduce(lambda a, b: a.unionByName(b), parts)
    assert sorted(map(tuple, un.collect())) == sorted(map(tuple, r.collect()))
    # manifest row accounting stays exact through the upsert layer
    m2 = st.read_manifest(st.latest_snapshot_id())["tables"]["side"]
    assert m2["total_rows"] == 193 and m2["total_rows_exact"]


def test_layout_refuses_bucket_granular_deltas(spark, tmp_path):
    st = CheckpointStore(
        str(tmp_path / "st"), n_partitions=4, bucket_layouts={"side": "host_key"}
    )
    df = _side(spark)
    st.commit({"side": df}, seed=1, round_epoch=0)
    extra = _side(spark, n=10).withColumn("number", F.col("number") + 1000)
    with pytest.raises(ValueError, match="bucket layout"):
        st.commit(
            {"side": df}, seed=1, round_epoch=1, deltas={"side": Append(extra)}
        )
    with pytest.raises(ValueError):
        st.read_buckets(spark, "side", df.limit(3).select("number"))


def test_layout_reopen_adopts_and_fold_rebuilds(spark, tmp_path):
    st = CheckpointStore(
        str(tmp_path / "st"),
        n_partitions=4,
        patch_layers_max=2,
        bucket_layouts={"side": ("host_key", 4)},
    )
    df = _side(spark)
    st.commit({"side": df}, seed=1, round_epoch=0)
    # stack to the bound: 3rd patch folds into a fresh bucketed base
    cur = df
    for k in range(3):
        upd = cur.filter(F.col("number") % 7 == k).withColumn(
            "priority", F.lit(k)
        )
        st.commit(
            {"side": st.read(spark, "side")},
            seed=1,
            round_epoch=k + 1,
            deltas={"side": Patch(upd, upsert=True, rows_delta=0)},
        )
    m = st.read_manifest(st.latest_snapshot_id())["tables"]["side"]
    assert not m["delta_layers"], "3rd patch at max=2 must fold"
    assert m["bucket_layout"]["written_by"] == st.latest_snapshot_id()
    assert st.read(spark, "side").count() == 200
    # reopen adopts the layout from the manifest
    st2 = CheckpointStore(str(tmp_path / "st"))
    assert st2.bucket_layouts["side"]["col"] == "host_key"
    assert len(st2.read_parts(spark, "side")) == 1


def test_layout_expiry_keeps_referenced_base(spark, tmp_path):
    st = CheckpointStore(
        str(tmp_path / "st"), n_partitions=4, bucket_layouts={"side": ("host_key", 4)}
    )
    df = _side(spark)
    st.commit({"side": df}, seed=1, round_epoch=0)  # s1: base A
    st.commit(
        {"side": df},
        seed=1,
        round_epoch=1,
        deltas={"side": Patch(df.limit(2), upsert=True, rows_delta=0)},
    )  # s2: layer on base A
    st.commit({"side": st.read(spark, "side")}, seed=1, round_epoch=2)  # s3: base B
    expired = st.expire_snapshots(keep_last=1)
    assert expired == [1, 2]
    # s1's base files are gone, s3's base survives and reads clean
    s1_dir = os.path.join(str(tmp_path / "st"), "s000001", "side")
    assert not os.path.isdir(s1_dir) or not any(
        f.endswith(".parquet") for f in os.listdir(s1_dir)
    )
    assert st.read(spark, "side").count() == 200


def test_append_commits_keep_file_count_bounded(spark, tmp_path):
    """r07 regression: partitionBy writes must stay bucket-aligned (one
    file per bucket per commit). Before the fix every input task wrote a
    file into every bucket dir it touched, and since the NEXT commit's
    scan tasks scale with file count, files snowballed round-over-round
    (measured: a 1k-row Append onto a 50k-row table wrote 2,604 files)."""
    st = CheckpointStore(str(tmp_path / "fc"), n_partitions=8)
    df = _side(spark, n=5_000, hosts=50)
    st.commit({"t": df.select("number", "host", "priority")}, seed=1, round_epoch=0)
    for k in range(3):
        extra = _side(spark, n=500, hosts=50).select(
            (F.col("number") + 10_000 * (k + 1)).alias("number"),
            "host",
            "priority",
        )
        st.commit(
            {"t": st.read(spark, "t").unionByName(extra)},
            seed=1,
            round_epoch=k + 1,
            deltas={"t": Append(extra)},
        )
    snap = st.latest_snapshot_id()
    tdir = os.path.join(str(tmp_path / "fc"), f"s{snap:06d}", "t")
    n_files = sum(
        1
        for _, _, fs in os.walk(tdir)
        for f in fs
        if f.endswith(".parquet")
    )
    # bucket-aligned: at most one file per bucket (8), not tasks x dirs
    assert n_files <= 8, n_files
    assert st.read(spark, "t").count() == 6_500
