"""Small engine utilities shared across operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure compute-heavy per-row operators actually parallelize.

    A small parquet file arrives as ONE input split (``maxPartitionBytes``
    is sized for scans, not for CPU-bound expression work), so md5/LSH
    signature computation would run on a single core. If the incoming
    partition count is below the cluster's default parallelism,
    repartition up — a cheap shuffle of the (narrow) input relative to
    the per-row compute it unlocks. At real scale (inputs with ≥ cores
    partitions) this is a metadata check and a no-op, preserving the
    scan's partitioning.

    Results are row-wise deterministic, so partitioning never changes
    operator output (asserted for signatures in
    tests/test_dedup_similarity.py::test_signatures_deterministic_across_partitioning).
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
