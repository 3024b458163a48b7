"""Merge-on-read read-amplification bench (VERDICT r04 next #5).

A Patch commit is O(delta), but every live layer adds work to READS:
the reconstruction is one window over the layer union plus one join
against the base, repeated until the chain folds at
``patch_layers_max``. This tool measures the actual read cost as layers
accumulate — for BOTH read shapes the engine uses per round:

- ``full``: ``store.read`` of the whole table (dashboard/user queries,
  and what the fold itself must execute);
- ``narrow``: the ``read_buckets(columns=key+state)`` point-read backing
  the round's transition merge (the per-round hot path).

Output: BENCH/patch_read.json with a ``roundengine_read_Nlayers`` row
family, the post-fold baseline, and the implied per-round cost model
that justifies the chosen ``patch_layers_max`` default.

Protocol matches bench.py: best-of-2 per point, noop-write sink.
Layer shape mirrors RoundEngine: column-granular (key + 7 state cols),
~100k uniformly-hashed keys per layer over a 4M-row base.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N_ROWS = int(os.environ.get("PATCH_READ_BENCH_ROWS", 4_000_000))
N_PER_LAYER = 100_000
CHECKPOINTS = (0, 1, 4, 8, 15)
MAX_LAYERS = max(CHECKPOINTS)


def best_of(fn, n: int = 2) -> float:
    fn()  # warm (codegen + file listing)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from crawlingathome_server_spark.datagen import synth_frontier_expr
    from crawlingathome_server_spark.plans.rounds import RoundEngine
    from crawlingathome_server_spark.session import get_spark
    from crawlingathome_server_spark.sources.checkpoint import (
        CheckpointStore,
        Patch,
    )

    spark = get_spark(app_name="patch_read_bench", cores="*")
    root = tempfile.mkdtemp(prefix="patch_read_bench", dir="/tmp")
    state_cols = RoundEngine.FRONTIER_STATE_COLS
    results: dict[str, dict] = {}
    try:
        store = CheckpointStore(
            root, n_partitions=64, patch_layers_max=MAX_LAYERS + 1
        )
        base = synth_frontier_expr(spark, N_ROWS)
        store.commit({"frontier": base}, seed=1, round_epoch=0)
        probe = spark.range(50_000).select(
            (F.col("id") * 37).alias("number")
        )
        narrow = ("number", *state_cols)

        def timed_reads() -> dict:
            full = store.read(spark, "frontier")
            sub = store.read_buckets(spark, "frontier", probe, columns=narrow)
            return {
                "full_read_sec": best_of(
                    lambda: full.write.format("noop").mode("overwrite").save()
                ),
                "narrow_point_read_sec": best_of(
                    lambda: sub.write.format("noop").mode("overwrite").save()
                ),
            }

        results["layers_0"] = timed_reads()
        for k in range(1, MAX_LAYERS + 1):
            # one round's worth of state flips: ~N_PER_LAYER uniformly-
            # hashed keys, column-granular layer exactly like RoundEngine
            lo = (k - 1) * N_PER_LAYER
            delta = spark.range(lo, lo + N_PER_LAYER).select(
                F.col("id").alias("number"),
                F.lit(True).alias("pending"),
                F.lit(False).alias("closed"),
                F.lit(False).alias("gpu"),
                F.lit(None).cast("string").alias("gpu_url"),
                F.lit(f"w{k}").alias("completor"),
                F.lit(None).cast("string").alias("cpu_completor"),
                F.lit(k).cast("long").alias("claim_epoch"),
            )
            store.commit(
                {"frontier": base},  # schema-only under Patch
                seed=1,
                round_epoch=k,
                deltas={"frontier": Patch(delta, columns=state_cols)},
            )
            if k in CHECKPOINTS:
                results[f"layers_{k}"] = timed_reads()
        # post-fold baseline: compact clears the chain — timing it IS the
        # measured fold cost the adaptive bound trades against
        t0 = time.perf_counter()
        store.compact(spark, seed=1, round_epoch=99)
        fold_sec = round(time.perf_counter() - t0, 3)
        post_meta = store.read_manifest(store.latest_snapshot_id())["tables"][
            "frontier"
        ]
        assert not post_meta["delta_layers"]
        results["post_fold"] = timed_reads()

        # VERDICT r05 #4: per-round chain overhead(max) ≈ fold_sec/max +
        # half_slope·max (amortized fold + average read amplification),
        # evaluated at the fixed-16 default vs the store's adaptive
        # bound (layers_bound from the fold_bps this run just measured)
        raw_slope = (
            results[f"layers_{MAX_LAYERS}"]["full_read_sec"]
            - results["layers_0"]["full_read_sec"]
        ) / MAX_LAYERS / 2
        # a noisy-neighbor inversion (layers_15 measuring faster than
        # layers_0) would make overhead() monotonically decreasing and
        # the comparison vacuous — fall back to the store's calibrated
        # constant and flag the record (r06 review fix)
        slope_sound = raw_slope > 0.01
        half_slope = raw_slope if slope_sound else CheckpointStore.LAYER_HALF_SLOPE_S
        tuned = CheckpointStore(
            root + "_na", patch_layers_max="auto"
        ).layers_bound(post_meta)

        def overhead(mx: int) -> float:
            return round(fold_sec / mx + half_slope * mx, 3)

        tuning = {
            "fold_sec_measured": fold_sec,
            "fold_bps_measured": post_meta.get("fold_bps"),
            "read_half_slope_sec_per_layer": round(half_slope, 4),
            "read_half_slope_raw": round(raw_slope, 4),
            "slope_sound": slope_sound,
            "patch_layers_max_tuned": tuned,
            "per_round_overhead_tuned_sec": overhead(tuned),
            "per_round_overhead_fixed16_sec": overhead(16),
            "tuned_le_fixed16": overhead(tuned) <= overhead(16),
        }
        shutil.rmtree(root + "_na", ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()

    flat = {
        f"roundengine_read_{k}": v
        for k, v in results.items()
    }
    summary = {
        "metric": "merge-on-read read cost vs live layer count",
        "n_rows": N_ROWS,
        "rows_per_layer": N_PER_LAYER,
        "protocol": "best-of-2, noop sink; column-granular layers "
        "(key + 7 state cols), RoundEngine shape",
        **flat,
        "adaptive_bound": tuning,
    }
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/patch_read.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
