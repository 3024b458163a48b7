"""SparkSession factory tuned for this engine.

Local mode stands in for a multi-executor cluster; partitioning decisions
(``spark.sql.shuffle.partitions``, AQE, Arrow) are made as if we were on a
1000-executor cluster reading 100 TB: AQE coalesces the small-scale test
shuffles, while the explicit repartition/salting logic in ``operators/``
carries the large-scale story.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "crawlingathome_server_spark",
    cores: int | str = "*",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    ``cores`` may be an int (``local[8]``) or ``"*"``. Honors
    ``SPARK_GRAFT_CPUS`` when ``cores`` is ``"*"``.
    """
    if cores == "*":
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cores), 8)
        except (TypeError, ValueError):
            shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # footer-only parquet COUNT/MIN/MAX (r08): the store's
        # written-count read-backs group by the partition dir column
        # with no filters, exactly the shape this pushdown answers from
        # parquet metadata instead of scanning row groups
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        # keep stdout/stderr clean for drivers that tail-capture the bench
        # JSON line (BENCH r03 was recorded parsed:null from output noise)
        .config("spark.ui.showConsoleProgress", "false")
        # Spark 4.1's checksummed streaming-checkpoint manager deadlocks on
        # plain local FS (state-store delta file creation awaits forever);
        # plain checkpoint files are fine for this engine's semantics.
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Oracle parity: DuckDB arithmetic is non-ANSI-strict on our inputs;
        # we keep ANSI off so integer wrap/div semantics match classic SQL.
        .config("spark.sql.ansi.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
