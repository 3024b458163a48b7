"""Seed loading (S1/S2/D1/D3/F1/F2) — reference update_db.py semantics."""

import json

from pyspark.sql import functions as F

from crawlingathome_server_spark.sources import seed


def _write_seed(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_load_seed_json_end_to_end(spark, tmp_path):
    open_rows = [
        {"url": "crawl/a.wat.gz", "start_id": "1", "end_id": "1000000", "shard": 0},
        {"url": "crawl/b.wat.gz", "start_id": "1", "end_id": "1000000", "shard": 1},
        # duplicate number (same end_id+shard as first) → D1 dedup
        {"url": "crawl/a-dup.wat.gz", "start_id": "1", "end_id": "1000000", "shard": 0},
    ]
    closed_rows = [
        {"url": "crawl/c.wat.gz", "start_id": "x", "end_id": "2000000", "shard": 0},
    ]
    gpu_rows = [
        {"url": "crawl/d.wat.gz", "start_id": "x", "end_id": "2000000", "shard": 1},
    ]
    _write_seed(tmp_path / "open.json", open_rows)
    _write_seed(tmp_path / "closed.json", closed_rows)
    _write_seed(tmp_path / "open_gpu.json", gpu_rows)

    out = seed.load_seed_json(
        spark,
        str(tmp_path / "open.json"),
        str(tmp_path / "closed.json"),
        str(tmp_path / "open_gpu.json"),
        directory="https://commoncrawl.example.org/",
    )
    rows = {r["number"]: r for r in out.collect()}
    # F2: number = (end_id/1e6)*2 - (shard==0)
    assert set(rows) == {1, 2, 3, 4}
    # F1: directory prefix
    assert rows[1]["url"].startswith("https://commoncrawl.example.org/crawl/")
    # D1: dedup kept one row for number 1 (4 rows total, not 5)
    assert out.count() == 4
    # D3 status flags
    assert rows[1]["closed"] is False and rows[1]["gpu"] is False
    assert rows[3]["closed"] is True
    assert rows[4]["gpu"] is True and rows[4]["closed"] is False


def test_shard_number_formula(spark):
    # update_db.py:12-16 exactly
    df = spark.createDataFrame(
        [("1000000", 0), ("1000000", 1), ("5000000", 0), ("5000000", 1),
         ("1500000", 0), ("1500000", 1)],
        ["end_id", "shard"],
    )
    got = [
        r["n"]
        for r in df.select(
            seed.shard_number(F.col("end_id"), F.col("shard")).alias("n")
        ).collect()
    ]
    # reference doubles the float quotient BEFORE int(): 1500000 → 1.5*2=3
    assert got == [1, 2, 9, 10, 2, 3]
