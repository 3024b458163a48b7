"""Seed loading (SURVEY.md §2.1 S1/S2, §2.6 D1/D3, §2.9 F1/F2).

The reference bulk-loads JSON shard lists (update_db.py:31-41), derives
shard numbers arithmetically (update_db.py:12-16), prefixes the download
directory (update_db.py:46), dedups by number with a python set
(update_db.py:98-105), unions open/closed/open_gpu partitions
(update_db.py:44-96) and bulk-inserts sorted by number (update_db.py:107,111).

Spark-first: three DataFrames with literal status columns unioned, the
number derivation as a codegen'd expression, dedup as dropDuplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_number(end_id: F.Column, shard_of_chunk: F.Column) -> F.Column:
    """``int((end_id/1e6)*2 − (shard==0))`` — reference update_db.py:12-16.

    Order of operations matches the reference exactly: the float quotient
    is doubled BEFORE truncation, so an odd multiple of 500000 (e.g.
    end_id=1500000, shard=1) yields 3, not 2."""
    count = (end_id.cast("double") / F.lit(1_000_000.0)) * 2 - F.when(
        shard_of_chunk == 0, 1
    ).otherwise(0)
    return F.floor(count).cast("long")


def full_url(directory: str, path: F.Column) -> F.Column:
    """``directory + data['url']`` — reference update_db.py:46."""
    return F.concat(F.lit(directory), path)


def load_seed_json(
    spark,
    open_path: str,
    closed_path: str,
    open_gpu_path: str,
    *,
    directory: str,
    schema=None,
):
    """S1: the reference's JSON seed load (update_db.py:31-41) end-to-end —
    read the three shard lists with an explicit schema (never infer at
    scale), derive number (F2) and full url (F1), union with status flags
    (D3), dedup (D1), sort by number (O3 semantics live in the writer).
    """
    from pyspark.sql import functions as F  # noqa: F811
    from pyspark.sql import types as T

    if schema is None:
        schema = T.StructType(
            [
                T.StructField("url", T.StringType(), False),
                T.StructField("start_id", T.StringType(), True),
                T.StructField("end_id", T.StringType(), False),
                T.StructField("shard", T.IntegerType(), False),
            ]
        )

    def _load(path: str):
        raw = spark.read.schema(schema).json(path)
        return raw.select(
            shard_number(F.col("end_id"), F.col("shard")).alias("number"),
            full_url(directory, F.col("url")).alias("url"),
            "start_id",
            "end_id",
            F.col("shard").alias("shard_of_chunk"),
        )

    unioned = union_seed_partitions(
        _load(open_path), _load(closed_path), _load(open_gpu_path)
    )
    return dedup_by_number(unioned)


def union_seed_partitions(
    open_df: DataFrame, closed_df: DataFrame, open_gpu_df: DataFrame
) -> DataFrame:
    """D3: open/closed/open_gpu lists → one frontier with status flags."""
    o = open_df.withColumns(
        {"pending": F.lit(False), "closed": F.lit(False), "gpu": F.lit(False)}
    )
    c = closed_df.withColumns(
        {"pending": F.lit(False), "closed": F.lit(True), "gpu": F.lit(False)}
    )
    g = open_gpu_df.withColumns(
        {"pending": F.lit(False), "closed": F.lit(False), "gpu": F.lit(True)}
    )
    return o.unionByName(c, allowMissingColumns=True).unionByName(
        g, allowMissingColumns=True
    )


def dedup_by_number(frontier: DataFrame) -> DataFrame:
    """D1: first-wins dedup on shard number (update_db.py:98-105).

    'First' is made deterministic: keep the lexicographically smallest
    url per number (the reference's set-based order was insertion order,
    which Spark must not depend on).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("number").orderBy(F.asc("url"))
    return (
        frontier.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
