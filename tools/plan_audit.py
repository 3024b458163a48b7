"""Regenerate BENCH/PLAN_AUDIT.md — physical-plan audit of the expensive
queries (node counts from ``explain("formatted")`` at sf0.01; plan shape
is scale-invariant, AQE may swap BHJ→SMJ as sides grow, which is the
desired behavior at 100×).

Usage: python tools/plan_audit.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"

#: (label, how-to-build, notes) — the headline-expensive queries plus the
#: pure-projection sanity rows
AUDIT = [
    ("dedup_minhash_lsh", "q", "bucket-join candidates, WindowGroupLimit bucket cap (asserted in test_plans); the ArrowEval nodes are the r08 INTENDED hybrid kernels (JVM shingle hashes -> one numpy affine-min pass, bit-identical to the expr form)"),
    ("dedup_simhash", "q", "pigeonhole block equi-join, bit_count filter; ArrowEval nodes = the r08 INTENDED numpy vote kernels (JVM md5 word hashes in, bit-identical signature out)"),
    ("sim_ann_lsh", "q", "band/bucket equi-join, exact re-score"),
    ("sim_knn_cosine", "q", "broadcast probes + IVF agreement stage (KMeans assign is a separate ML job, not in this plan)"),
    ("urlseen_bloom_probe", "q", "the pandas-group nodes are the INTENDED applyInPandas/cogroup bitmap ops (bitmap crosses Python once per bucket, never per row)"),
    ("t_fingerprint", "q", "pure JVM projection — zero shuffle"),
    ("f9_url_canonicalize", "q", "pure JVM projection — zero shuffle"),
    ("t_curation_pipeline", "q", "filter → hash dedup → keeper join"),
    ("flagship expand_frontier (robots)", "flagship", "Python-free end-to-end (plan-asserted); robots broadcast; salted two-phase claim"),
    ("expand_frontier follow_links", "follow_links", "JVM href extraction → explode → relative-href resolution (r04, builtin aggregate fold) → canonicalize → claim; Python-free"),
    ("claim_batch column-budget 2M", "budgeted", "salted two-phase rank (two Window phases, plan-asserted in bench.py)"),
    ("extract_text_jvm", "extract_jvm", "pure JVM projection — zero shuffle, zero Python"),
    ("cuckoo probe 100k", "cuckoo_probe", "cogroup by bucket — table crosses Python once per bucket, like the bloom probe"),
    ("curate pipeline (r07)", "curate", "extract staged ONCE (decode ×1 — the pushed-down length filter used to re-run it ×3); gates above the dedup-window barrier; Python-free"),
]


def build(name: str, spark):
    import __spark_entry__ as se
    from pyspark.sql import functions as F

    from crawlingathome_server_spark import datagen
    from crawlingathome_server_spark.plans.rounds import expand_frontier

    if name == "flagship":
        return expand_frontier(
            datagen.pages(spark, seed=3, n=100), datagen.robots(spark), seed=1
        )
    if name == "follow_links":
        return expand_frontier(
            datagen.pages(spark, seed=3, n=100),
            datagen.robots(spark),
            seed=1,
            follow_links=True,
        )
    if name == "budgeted":
        from crawlingathome_server_spark.datagen import synth_frontier_expr
        from crawlingathome_server_spark.operators.claim import claim_batch

        robots = spark.range(50_000).select(
            F.concat(F.lit("host"), F.col("id"), F.lit(".example.com")).alias("host"),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(16)) + 1)
            .cast("int")
            .alias("max_claims_per_round"),
        )
        return claim_batch(
            synth_frontier_expr(spark, 2_000_000), robots, seed=1, with_payload=False
        )
    if name == "cuckoo_probe":
        from crawlingathome_server_spark.operators import urlseen

        urls = spark.range(100_000).select(
            F.concat(F.lit("http://h"), F.col("id")).alias("canon_url")
        )
        params = urlseen.auto_cuckoo_params(100_000)
        flt = urlseen.build_cuckoo_filter(urlseen.hash_urls(urls), **params)
        return urlseen.probe_cuckoo_filter(urlseen.hash_urls(urls), flt, **params)
    if name == "curate":
        from crawlingathome_server_spark.plans.rounds import CrawlEngine
        from crawlingathome_server_spark.sources.checkpoint import CheckpointStore
        import tempfile

        store = CheckpointStore(tempfile.mkdtemp(prefix="audit_cur", dir="/tmp"))
        eng = CrawlEngine(
            spark, store, curate=True, curate_min_chars=50
        )
        df, _caches = eng._curate_pages(datagen.pages(spark, seed=3, n=100), 1, {})
        return df
    if name == "extract_jvm":
        from crawlingathome_server_spark.functions.text import extract_text_jvm

        return datagen.pages(spark, seed=3, n=100).select(
            extract_text_jvm(F.col("html")).alias("t")
        )
    return None  # resolved via queries()


def main() -> None:
    import __spark_entry__ as se
    from crawlingathome_server_spark.session import get_spark

    spark = get_spark(app_name="plan_audit", cores=8)
    qs = se.queries()
    rows = []
    for label, kind, notes in AUDIT:
        df = build(kind, spark) if kind != "q" else qs[label](spark, SF_DIR)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        n_exch = len(re.findall(r"\bExchange\b", plan))
        n_py = len(
            re.findall(
                r"ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas",
                plan,
            )
        )
        n_cart = plan.count("CartesianProduct")
        n_bhj = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        joins = " + ".join(
            x
            for x in (
                f"{n_bhj} BHJ" if n_bhj else "",
                f"{n_smj} SMJ" if n_smj else "",
            )
            if x
        ) or "0"
        rows.append((label, n_exch, n_py, n_cart, joins, notes))
    spark.stop()

    md = [
        "# Physical-plan audit — the expensive queries (regenerated by tools/plan_audit.py)",
        "",
        '`explain("formatted")` node counts at sf0.01 (shape is scale-invariant;',
        "AQE may swap BroadcastHashJoin→SortMergeJoin when sides grow, which is",
        "the desired behavior). Reproduce: `python tools/plan_audit.py`.",
        "",
        "| query | Exchange | Python eval | Cartesian | joins | notes |",
        "|---|---|---|---|---|---|",
    ]
    for label, n_exch, n_py, n_cart, joins, notes in rows:
        md.append(f"| {label} | {n_exch} | {n_py} | {n_cart} | {joins} | {notes} |")
    md += [
        "",
        "Scale-killers checked and absent: no row-at-a-time Python, no",
        "cartesian products, no unpruned scans (PushedFilters/ReadSchema",
        "asserted in tests/test_plans.py), small sides broadcast, hot-bucket",
        "caps push map-side. The only Python-eval nodes anywhere are the",
        "intended per-bucket bitmap cogroups in urlseen.",
        "",
    ]
    out = os.path.join("/root/repo", "BENCH", "PLAN_AUDIT.md")
    with open(out, "w") as f:
        f.write("\n".join(md))
    print(f"wrote {out}")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
