"""r08 optimization-round measurement harness (guide §1).

Times each declared headline query in isolation (noop sink, best-of-N)
and dumps ``explain("formatted")`` to plans/r08/<name>_<tag>.txt.

Usage:
    python tools/r08_measure.py <tag> [query ...]      # tag = before|after
    python tools/r08_measure.py before                  # all bench-timed entry queries

Never touches bench.py (frozen). Numbers quoted in OPTIMIZATION_r08.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08")

#: entry-dict queries timed by bench.py's headline loop (+ the expr dedup
#: contrast rows that exercise the same operators)
BENCH_TIMED = [
    "j1_fk_prefetch_join",
    "a1_dashboard_counts",
    "a3_grouped_sum",
    "o1_topk_per_type",
    "o4_seeded_hash_claim",
    "d1_dedup_first_wins",
    "j5_leaderboard_upsert",
    "t_lang_id",
    "t_quality_features",
    "dedup_exact_hash",
    "sim_knn_cosine",
    "sim_ann_lsh",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "a5_eta_estimate",
    "t_token_count_bpeish",
]


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    wanted = sys.argv[2:] or BENCH_TIMED
    n = int(os.environ.get("R08_REPEATS", "3"))

    from crawlingathome_server_spark.session import get_spark

    import __spark_entry__ as se

    spark = get_spark(app_name=f"r08_measure_{tag}", cores="*")
    qs = se.queries()
    os.makedirs(PLANS_DIR, exist_ok=True)

    # warm like bench.py does
    for t in ("orders", "customer", "events", "documents", "embeddings", "lineitem"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    out = {}
    for name in wanted:
        fn = qs[name]
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        spark.sparkContext.setJobDescription(f"r08:{name}")
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            _materialize(qs[name](spark, SF_DIR))
            samples.append(round(time.perf_counter() - t0, 4))
        out[name] = {"min": min(samples), "samples": samples}
        print(f"{name:32s} min={min(samples):7.3f}  {samples}")
        spark.sparkContext.setJobDescription(None)

    path = os.path.join(PLANS_DIR, f"timings_{tag}.json")
    with open(path, "w") as f:
        json.dump({"sf_dir": SF_DIR, "loadavg": os.getloadavg()[0], "queries": out}, f, indent=2)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
