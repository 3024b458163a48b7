"""Partitioned-Bloom URL-seen tests (D2): zero false negatives, bounded
false-positive rate, exact anti-join as ground truth."""

from pyspark.sql import functions as F

from crawlingathome_server_spark import datagen
from crawlingathome_server_spark.functions.urls import canonicalize_url
from crawlingathome_server_spark.operators import urlseen


def _canon(df):
    return df.select(canonicalize_url(F.col("url")).alias("canon_url")).dropDuplicates(
        ["canon_url"]
    )


def test_no_false_negatives(spark):
    pages = datagen.pages(spark, seed=21, n=1500)
    seen = _canon(pages)
    flt = urlseen.build_seen_filter(urlseen.hash_urls(seen))
    probed = urlseen.probe_seen_filter(urlseen.hash_urls(seen), flt)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_false_positive_rate_bounded(spark):
    seen = _canon(datagen.pages(spark, seed=21, n=1500))
    flt = urlseen.build_seen_filter(urlseen.hash_urls(seen))
    novel = (
        spark.range(5000)
        .select(F.concat(F.lit("http://unseen.example.net/x/"), F.col("id")).alias("canon_url"))
    )
    probed = urlseen.probe_seen_filter(urlseen.hash_urls(novel), flt)
    fp = probed.filter(F.col("maybe_seen")).count()
    assert fp / 5000 < 0.02, f"FPR {fp/5000}"


def test_bloom_agrees_with_exact_oracle(spark):
    """maybe_seen=False ⇒ exact-unseen (the subset property that makes the
    filter safe for crawl dedup)."""
    pages = datagen.pages(spark, seed=23, n=1000)
    seen = _canon(pages.limit(600))
    cand = _canon(pages)
    flt = urlseen.build_seen_filter(urlseen.hash_urls(seen))
    bloom_unseen = set(
        r["canon_url"]
        for r in urlseen.probe_seen_filter(urlseen.hash_urls(cand), flt)
        .filter(~F.col("maybe_seen"))
        .collect()
    )
    exact_unseen = set(
        r["canon_url"] for r in urlseen.unseen_exact(cand, seen).collect()
    )
    assert bloom_unseen <= exact_unseen
    # and the filter is not degenerate: it keeps most truly-unseen urls
    assert len(bloom_unseen) > 0.95 * len(exact_unseen)


def test_filter_deterministic_across_partitioning(spark):
    seen = _canon(datagen.pages(spark, seed=25, n=800))
    f1 = {
        r["bucket"]: r["bitmap"]
        for r in urlseen.build_seen_filter(urlseen.hash_urls(seen).repartition(2)).collect()
    }
    f2 = {
        r["bucket"]: r["bitmap"]
        for r in urlseen.build_seen_filter(urlseen.hash_urls(seen).repartition(11)).collect()
    }
    assert f1 == f2
