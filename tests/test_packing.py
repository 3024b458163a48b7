"""Sequence packing / sharded corpus export (operators/packing.py).

Exactness is proven against plain-Python references computed from the
SAME hash values Spark assigned (the hash itself is the determinism
anchor — a pure function of the doc key), and determinism is proven by
re-running the assignment under different input partitionings.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from crawlingathome_server_spark.operators import packing

SEQ = 256
SHARDS = 5


def _docs(spark, n=4000, oversize_every=0):
    tok = (F.col("id") % 90 + 3).cast("int")
    if oversize_every:
        tok = F.when(
            F.col("id") % oversize_every == 0, F.lit(SEQ + 17)
        ).otherwise(tok)
    return spark.range(n).select(
        F.xxhash64(F.concat(F.lit("doc-"), F.col("id"))).alias("fingerprint"),
        tok.alias("n_tokens"),
    )


def _chunk_reference(rows, seq_len=SEQ, sep=1):
    """(fingerprint -> (stream_off, pack_id, pack_off, pack_id_last))
    from the Spark-assigned (shard, order_key) — independent cumsum."""
    out = {}
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: (r["order_key"], r["fingerprint"]))
        off = 0
        for r in shard_rows:
            span = r["n_tokens"] + sep
            out[r["fingerprint"]] = (
                off,
                off // seq_len,
                off % seq_len,
                # last CONTENT token's chunk (separators excluded;
                # max(n,1)-1 keeps a zero-token doc in its own pack_id)
                (off + max(r["n_tokens"], 1) - 1) // seq_len,
            )
            off += span
    return out


def test_pack_chunks_matches_reference(spark):
    got = packing.pack_chunks(
        _docs(spark), SEQ, n_shards=SHARDS, sep_tokens=1
    ).collect()
    assert {r["shard"] for r in got} == set(range(SHARDS))
    ref = _chunk_reference(got)
    for r in got:
        assert (
            r["stream_off"], r["pack_id"], r["pack_off"], r["pack_id_last"]
        ) == ref[r["fingerprint"]], r
    # straddlers exist and are exactly the cut-crossing docs
    assert any(r["pack_id_last"] > r["pack_id"] for r in got)


def test_pack_assignment_partitioning_invariant(spark):
    """Same rows → same (shard, pack_id, stream_off) no matter how the
    input is partitioned — the property that makes the export
    reproducible across cluster sizes."""
    docs = _docs(spark, 2500)
    a = {
        r["fingerprint"]: (r["shard"], r["stream_off"], r["pack_id"])
        for r in packing.pack_chunks(
            docs.repartition(11), SEQ, n_shards=SHARDS
        ).collect()
    }
    b = {
        r["fingerprint"]: (r["shard"], r["stream_off"], r["pack_id"])
        for r in packing.pack_chunks(
            docs.repartition(2, "n_tokens"), SEQ, n_shards=SHARDS
        ).collect()
    }
    assert a == b


def test_pack_greedy_matches_reference(spark):
    got = packing.pack_greedy(
        _docs(spark, 3000, oversize_every=97), SEQ, n_shards=SHARDS
    ).collect()
    by_shard = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r)
    n_oversize = 0
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: (r["order_key"], r["fingerprint"]))
        cur, fill = 0, 0
        for r in shard_rows:
            n = r["n_tokens"]
            if n > SEQ:
                if fill > 0:
                    cur += 1
                assert (r["pack_id"], r["pack_off"], r["oversize"]) == (
                    cur, 0, True,
                ), r
                cur, fill = cur + 1, 0
                n_oversize += 1
                continue
            if fill + n > SEQ:
                cur, fill = cur + 1, 0
            assert (r["pack_id"], r["pack_off"], r["oversize"]) == (
                cur, fill, False,
            ), r
            fill += n
        # no pack overflows (oversize packs excepted, they hold one doc)
        packs = {}
        for r in shard_rows:
            if not r["oversize"]:
                packs[r["pack_id"]] = packs.get(r["pack_id"], 0) + r["n_tokens"]
        assert all(v <= SEQ for v in packs.values())
    assert n_oversize == len([r for r in got if r["oversize"]]) > 0


def test_pack_greedy_partitioning_invariant(spark):
    docs = _docs(spark, 1500, oversize_every=53)
    a = {
        r["fingerprint"]: (r["shard"], r["pack_id"], r["pack_off"])
        for r in packing.pack_greedy(
            docs.repartition(7), SEQ, n_shards=3
        ).collect()
    }
    b = {
        r["fingerprint"]: (r["shard"], r["pack_id"], r["pack_off"])
        for r in packing.pack_greedy(
            docs.coalesce(1), SEQ, n_shards=3
        ).collect()
    }
    assert a == b


def test_export_corpus_layout_and_stats(spark, tmp_path):
    path = str(tmp_path / "export")
    docs = _docs(spark, 2000)
    stats = {
        r["shard"]: r
        for r in packing.export_corpus(
            docs, path, n_shards=SHARDS, seq_len=SEQ
        ).collect()
    }
    assert set(stats) == set(range(SHARDS))
    assert sum(r["n_docs"] for r in stats.values()) == 2000
    total_tokens = docs.agg(F.sum("n_tokens")).first()[0]
    assert sum(r["n_tokens"] for r in stats.values()) == total_tokens
    for shard in range(SHARDS):
        files = glob.glob(os.path.join(path, f"shard={shard}", "*.parquet"))
        # one file per shard: loaders list exactly one object per shard
        assert len(files) == 1, files
        part = spark.read.parquet(os.path.join(path, f"shard={shard}"))
        rows = part.collect()
        # file row order IS the pack stream order (writer cuts
        # sequences by reading sequentially, no sort needed)
        offs = [r["stream_off"] for r in rows]
        assert offs == sorted(offs)
        assert stats[shard]["n_packs"] == max(r["pack_id_last"] for r in rows) + 1


def test_pack_md5_mode_and_validation(spark):
    """md5 hash_mode (the oracle-parity family) produces a complete,
    deterministic assignment too; bad params raise."""
    docs = _docs(spark, 300)
    got = packing.pack_chunks(
        docs, SEQ, n_shards=4, hash_mode="md5"
    ).collect()
    assert len(got) == 300 and {r["shard"] for r in got} <= set(range(4))
    ref = _chunk_reference(got)
    for r in got:
        assert (
            r["stream_off"], r["pack_id"], r["pack_off"], r["pack_id_last"]
        ) == ref[r["fingerprint"]]
    with pytest.raises(ValueError):
        packing.assign_shards(docs, 0)
    with pytest.raises(ValueError):
        packing.pack_chunks(docs, 0, n_shards=4)
    with pytest.raises(ValueError):
        packing.assign_shards(docs, 4, hash_mode="sha1")
