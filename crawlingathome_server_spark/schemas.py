"""Explicit StructType schemas for every engine table.

The reference keeps fixed schemas via ORM-generated DDL
(reference: main.py:851-857, models.py); we pin them as StructTypes so
parquet/Iceberg scans never infer. Shapes follow SURVEY.md §1.4 and
FIXTURES.md; ``PAGES`` is the BASELINE.json input_hint shape.
"""

from __future__ import annotations

from pyspark.sql import types as T

# BASELINE.json input_hint: (url:string, warc_ts:timestamp, html:binary,
# text:string, lang:string)
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Mirrors reference Job (models.py:10-47) + our scheduler columns.
FRONTIER = T.StructType(
    [
        T.StructField("number", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("start_id", T.StringType(), True),
        T.StructField("end_id", T.StringType(), True),
        T.StructField("shard_of_chunk", T.IntegerType(), True),
        T.StructField("gpu", T.BooleanType(), False),
        T.StructField("gpu_url", T.StringType(), True),
        T.StructField("pending", T.BooleanType(), False),
        T.StructField("closed", T.BooleanType(), False),
        T.StructField("completor", T.StringType(), True),
        T.StructField("cpu_completor", T.StringType(), True),
        T.StructField("priority", T.DoubleType(), True),
        T.StructField("claim_epoch", T.LongType(), True),
    ]
)

# Mirrors reference Client (models.py:51-78); FK becomes a nullable key.
WORKERS = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("display_name", T.StringType(), True),
        T.StructField("type", T.StringType(), False),  # HYBRID | CPU | GPU
        T.StructField("user_nickname", T.StringType(), True),
        T.StructField("shard_number", T.LongType(), True),
        T.StructField("progress", T.StringType(), True),
        T.StructField("jobs_completed", T.LongType(), False),
        T.StructField("first_seen", T.LongType(), False),  # epoch seconds
        T.StructField("last_seen", T.LongType(), False),
    ]
)

# Politeness dim table (ours, per north rule).
ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("crawl_delay_s", T.DoubleType(), False),
        T.StructField("max_claims_per_round", T.IntegerType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), True),
        # REP Allow carve-outs (r04) — longest-match wins vs disallow
        T.StructField("allow_prefixes", T.ArrayType(T.StringType()), True),
    ]
)

# Discovery-loop worklist tables (r06): CrawlEngine emits these per round
# and the caller's fetcher drains them — hosts whose robots.txt is not in
# the politeness dim table yet, and advertised sitemap documents awaiting
# a fetch. Keyed on their first column (store contract).
ROBOTS_QUEUE = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("robots_url", T.StringType(), False),
    ]
)

SITEMAP_QUEUE = T.StructType(
    [
        T.StructField("sitemap_url", T.StringType(), False),
        T.StructField("host", T.StringType(), True),
    ]
)

# Mirrors Leaderboard / CPU_Leaderboard (models.py:82-100).
LEADERBOARD = T.StructType(
    [
        T.StructField("nickname", T.StringType(), False),
        T.StructField("jobs_completed", T.LongType(), False),
        T.StructField("pairs_scraped", T.LongType(), False),
    ]
)

CPU_LEADERBOARD = T.StructType(
    [
        T.StructField("nickname", T.StringType(), False),
        T.StructField("jobs_completed", T.LongType(), False),
    ]
)

# Completion event log (feeds U2/U3 merges + A3 leaderboard + A5 ETA).
COMPLETIONS = T.StructType(
    [
        T.StructField("number", T.LongType(), False),
        T.StructField("worker_uuid", T.StringType(), False),
        T.StructField("nickname", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),  # hybrid | gpu | cpu
        T.StructField("count", T.LongType(), False),  # pairs scraped
        T.StructField("gpu_url", T.StringType(), True),
        T.StructField("epoch", T.LongType(), False),
    ]
)

# Counters snapshot (stands in for the Redis scalar keys, cache.py:42-46).
COUNTERS = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.LongType(), False),
        T.StructField("expires", T.LongType(), False),  # epoch seconds
    ]
)


# Curated-corpus table (CrawlEngine curate=True, r07): one row per unique
# document fingerprint that survived the language + quality gates.
CORPUS = T.StructType(
    [
        T.StructField("fingerprint", T.LongType(), False),
        T.StructField("canon_url", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("quality", T.DoubleType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("curated_epoch", T.LongType(), False),
    ]
)
