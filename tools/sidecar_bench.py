"""Open-set sidecar asymptotics at depth (VERDICT r05 #3).

bench.py's 16M/1%-open claim contrast (sidecar 1.27 s vs full-scan
1.52 s) barely separates from scan noise because a column-pruned 16M
scan is cheap and only 3 merge-on-read layers were live. This tool
measures the contrast where the asymptotics actually bite:

- **64M rows** (4× the bench store, ~0.5% of the 10^10 design point),
- **1% open fraction** (mature-crawl shape),
- **6 live column-granular Patch layers** on the frontier (the steady
  state between folds) — the full-scan path must reconstruct the table
  through the layer window + join EVERY claim, the sidecar path never
  does (its upsert layers are over the tiny open set).

Both sides run the identical politeness claim
(operators/claim.claim_batch, literal budget, with_payload=False,
noop-write sink) and are INTERLEAVED best-of-3 so neighbor noise hits
both alike. Output: BENCH/sidecar_asymptotics.json with
``claim_sidecar_speedup_64m_1pct`` = full_best / sidecar_best.

Caveat recorded in the output: each committed round CLAIMS from the
open set, so six rounds at budget 1 deplete it from 1% toward ~0.5%;
``n_open_at_measure`` is the manifest's exact surviving open count —
the full-scan side still reconstructs and scans all 64M rows either
way, which is the point.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N_ROWS = int(os.environ.get("SIDECAR_BENCH_ROWS", 64_000_000))
OPEN_FRAC = 0.01
N_LAYER_ROUNDS = 6
ATTEMPTS = 3


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    from pyspark.sql import functions as F

    from crawlingathome_server_spark.datagen import synth_frontier_expr
    from crawlingathome_server_spark.datagen import workers as synth_workers
    from crawlingathome_server_spark.operators import claim as claim_op
    from crawlingathome_server_spark.plans.rounds import RoundEngine
    from crawlingathome_server_spark.session import get_spark
    from crawlingathome_server_spark.sources.checkpoint import CheckpointStore

    spark = get_spark(app_name="sidecar_bench", cores="*")
    root = tempfile.mkdtemp(prefix="sidecar_bench", dir="/tmp")
    try:
        store = CheckpointStore(root, n_partitions=64)
        eng = RoundEngine(spark, store, seed=9, host_default_budget=1)
        eng.bootstrap(
            synth_frontier_expr(spark, N_ROWS, open_frac=OPEN_FRAC),
            synth_workers(spark),
        )
        round_loads = []
        for ep in range(1, N_LAYER_ROUNDS + 1):
            round_loads.append(round(os.getloadavg()[0], 2))
            eng.run_round(round_epoch=ep, frontier_commit="patch")
        manifest = store.read_manifest(store.latest_snapshot_id())
        n_layers = len(manifest["tables"]["frontier"]["delta_layers"])
        n_open = manifest["tables"][RoundEngine.OPEN_SIDECAR]["total_rows"]

        sidecar = (
            store.read(spark, RoundEngine.OPEN_SIDECAR)
            .withColumn("pending", F.lit(False))
            .withColumn("closed", F.lit(False))
        )
        full = store.read(spark, "frontier")

        def run(df) -> None:
            claim_op.claim_batch(
                df, None, seed=5, default_budget=2, with_payload=False
            ).write.format("noop").mode("overwrite").save()

        # warm both plans (codegen + file listing), then interleave
        run(sidecar)
        run(full)
        times = {"sidecar": [], "full": [], "loads": []}
        for _ in range(ATTEMPTS):
            for label, df in (("sidecar", sidecar), ("full", full)):
                times["loads"].append(round(os.getloadavg()[0], 2))
                t0 = time.perf_counter()
                run(df)
                times[label].append(round(time.perf_counter() - t0, 3))
        best_s, best_f = min(times["sidecar"]), min(times["full"])
        out = {
            "metric": f"sidecar vs full-scan claim, {N_ROWS:,} rows / "
            f"1pct open / {n_layers} live MOR layers",
            "n_rows": N_ROWS,
            "open_frac_bootstrap": OPEN_FRAC,
            "n_open_at_measure": n_open,
            "n_live_frontier_layers": n_layers,
            "protocol": "identical claim_batch both sides, noop sink, "
            f"interleaved best-of-{ATTEMPTS}; per-run 1-min loads recorded",
            "round_loads": round_loads,
            "sidecar_claim_sec": times["sidecar"],
            "fullscan_claim_sec": times["full"],
            "measure_loads": times["loads"],
            "sidecar_best_sec": best_s,
            "fullscan_best_sec": best_f,
            "claim_sidecar_speedup_64m_1pct": round(best_f / best_s, 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/sidecar_asymptotics.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
