"""Deterministic synthetic crawl-domain data (FIXTURES.md §A).

Everything is a pure function of ``(seed, n)`` built with numpy vectorized
ops in pandas, then handed to Spark over Arrow — partitioning never affects
content, so any test or bench input is reproducible at any parallelism.
No external data (north rule).

Mirrors the reference's seed semantics:
- shard number = ``(end_id/1e6)*2 - (shard==0)`` (reference: update_db.py:12-16)
- full url = directory + path (reference: update_db.py:46)
- open/closed/open_gpu split + duplicate numbers (reference: update_db.py:44-105)
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import schemas

DIRECTORY = "https://commoncrawl.example.org/"  # shard_info 'directory' analogue
_BASE_EPOCH = 1_600_000_000

_WORDS_EN = "the quick brown fox jumps over a lazy dog and runs to of is".split()
_WORDS_DE = "der hund und die katze nicht ist schnell springt über den zaun".split()
_WORDS_FR = "le chat les chiens des maisons est une belle ville dans jardin".split()
_WORDS_ES = "el perro los gatos que corre es una casa grande en la calle".split()
_WORDS = {"en": _WORDS_EN, "de": _WORDS_DE, "fr": _WORDS_FR, "es": _WORDS_ES}
_LANGS = ["en", "de", "fr", "es", "nolang"]


def _rng(seed: int) -> np.random.RandomState:
    return np.random.RandomState(seed)


def _zipf_hosts(rng: np.random.RandomState, n: int, n_hosts: int) -> np.ndarray:
    """Zipf-distributed host indices → hot hosts for skew tests."""
    ranks = np.arange(1, n_hosts + 1, dtype="float64")
    probs = 1.0 / ranks
    probs /= probs.sum()
    return rng.choice(n_hosts, size=n, p=probs)


def gen_pages_pdf(seed: int = 7, n: int = 2000, n_hosts: int = 50) -> pd.DataFrame:
    """Common-Crawl-style pages with canonicalization traps and skewed hosts."""
    rng = _rng(seed)
    host_idx = _zipf_hosts(rng, n, n_hosts)
    case_trap = rng.randint(0, 3, n)  # 0 plain, 1 mixed-case host, 2 default port
    dup = rng.rand(n) < 0.05  # duplicate urls (point at row i-1)

    hosts, urls, texts, langs = [], [], [], []
    for i in range(n):
        h = f"host{host_idx[i]:04d}.example.com"
        lang = _LANGS[int((host_idx[i] * 2654435761 + i) % len(_LANGS))]
        words = _WORDS.get(lang, ["zxqj", "vwkp", "qqrr", "xxyz"])
        k = 8 + (i * 7) % 25
        text = " ".join(words[(i + j) % len(words)] for j in range(k))
        base = f"/p/{i % 97}/doc{i}"
        if case_trap[i] == 1:
            u = f"HTTP://{h.upper()}{base}?b=2&a=1#frag"
        elif case_trap[i] == 2:
            u = f"http://{h}:80{base}?b=2&a=1"
        else:
            u = f"http://{h}{base}?a=1&b=2"
        if dup[i] and i > 0:
            u, h, text, lang = urls[i - 1], hosts[i - 1], texts[i - 1], langs[i - 1]
        hosts.append(h)
        urls.append(u)
        texts.append(text)
        langs.append(lang)

    html = [
        (
            f"<html><head><title>t{i}</title><script>var x=1;</script></head>"
            f"<body><p>{texts[i]}</p>"
            # deterministic outgoing links: next doc on this host + a doc on
            # a rotated host (frontier-expansion test input)
            f'<a href="http://{hosts[i]}/p/{(i + 1) % 97}/doc{i + 1}"></a> '
            f'<a HREF=\'http://host{(host_idx[i] + 1) % n_hosts:04d}.example.com/x/{i}\'></a>'
            f'<a href="/relative/skip{i}"></a>'
            f"</body></html>"
        ).encode("utf-8")
        for i in range(n)
    ]
    ts = [
        dt.datetime.fromtimestamp(_BASE_EPOCH + int(i) * 60, tz=dt.timezone.utc)
        for i in range(n)
    ]
    return pd.DataFrame(
        {"url": urls, "warc_ts": ts, "html": html, "text": texts, "lang": langs}
    )


def gen_frontier_pdf(seed: int = 11, n: int = 1000, n_hosts: int = 40) -> pd.DataFrame:
    """Frontier mirroring the Job seed loader's semantics + state mix."""
    rng = _rng(seed)
    idx = np.arange(n, dtype="int64")
    shard_of_chunk = (idx % 2).astype("int32")
    end_id = (idx // 2 + 1) * 1_000_000
    start_id = end_id - 999_999
    # reference derivation: update_db.py:12-16
    number = (end_id // 1_000_000) * 2 - (shard_of_chunk == 0).astype("int64")
    host_idx = _zipf_hosts(rng, n, n_hosts)
    hosts = np.array([f"host{i:04d}.example.com" for i in host_idx])
    urls = np.array(
        [f"{DIRECTORY}crawl-data/seg-{i % 100:03d}/wat/shard{i}.wat.gz" for i in idx]
    )
    state = rng.choice(
        ["open", "pending", "closed", "open_gpu", "pending_gpu"],
        size=n,
        p=[0.55, 0.1, 0.2, 0.1, 0.05],
    )
    pending = np.isin(state, ["pending", "pending_gpu"])
    closed = state == "closed"
    gpu = np.isin(state, ["open_gpu", "pending_gpu"])
    num_str = pd.Series(number).astype(str)
    gpu_url = np.where(
        gpu | closed,
        np.where(
            rng.rand(n) < 0.1,
            ("postgres://intermediate/" + num_str).to_numpy(),
            ("https://artifacts.example.org/rsync/" + num_str).to_numpy(),
        ),
        None,
    )
    priority = np.round(rng.rand(n), 6)
    pdf = pd.DataFrame(
        {
            "number": number,
            "url": urls,
            "host": hosts,
            "start_id": start_id.astype(str),
            "end_id": end_id.astype(str),
            "shard_of_chunk": shard_of_chunk,
            "gpu": gpu,
            "gpu_url": gpu_url,
            "pending": pending,
            "closed": closed,
            "completor": np.where(pending, ("tok-" + num_str).to_numpy(), None),
            "cpu_completor": np.where(gpu, "cpuworker", None),
            "priority": priority,
            "claim_epoch": pd.array([None] * n, dtype="Int64"),
        }
    )
    # Duplicate shard numbers to exercise dedup (reference: update_db.py:98-105)
    n_dup = max(1, n // 50)
    dup_rows = pdf.iloc[: n_dup].copy()
    dup_rows["url"] = dup_rows["url"] + "?dup=1"
    return pd.concat([pdf, dup_rows], ignore_index=True)


def gen_workers_pdf(seed: int = 13, n: int = 60) -> pd.DataFrame:
    rng = _rng(seed)
    now = _BASE_EPOCH + 100_000
    types = rng.choice(["CPU", "GPU", "HYBRID"], size=n, p=[0.5, 0.3, 0.2])
    first_seen = now - rng.randint(1000, 500_000, n)
    # ~25% idle beyond IDLE_TIMEOUT=7200 (reference: config.py:8) for reaper tests
    idle = rng.rand(n) < 0.25
    last_seen = np.where(idle, now - 7200 - rng.randint(1, 10_000, n), now - rng.randint(0, 600, n))
    has_shard = rng.rand(n) < 0.5
    return pd.DataFrame(
        {
            "uuid": [f"uuid-{i:04d}" for i in range(n)],
            "display_name": [f"name-{i}" for i in range(n)],
            "type": types,
            "user_nickname": [f"nick{i % 17}" for i in range(n)],
            "shard_number": pd.array(
                [int(i * 3 + 1) if has_shard[i] else None for i in range(n)],
                dtype="Int64",
            ),
            "progress": ["working" for _ in range(n)],
            "jobs_completed": rng.randint(0, 500, n).astype("int64"),
            "first_seen": first_seen.astype("int64"),
            "last_seen": last_seen.astype("int64"),
        }
    )


def gen_robots_pdf(seed: int = 17, n_hosts: int = 50) -> pd.DataFrame:
    rng = _rng(seed)
    delays = rng.choice([0.5, 1.0, 2.0, 5.0], size=n_hosts)
    return pd.DataFrame(
        {
            "host": [f"host{i:04d}.example.com" for i in range(n_hosts)],
            "crawl_delay_s": delays,
            "max_claims_per_round": np.maximum(1, (30.0 / delays)).astype("int32"),
            "disallow_prefixes": [
                ["/private", "/admin"] if i % 5 == 0 else [] for i in range(n_hosts)
            ],
            # every other disallowing host carves a public subtree back
            # out (REP longest-match: Allow beats the shorter Disallow)
            "allow_prefixes": [
                ["/private/pub"] if i % 10 == 0 else [] for i in range(n_hosts)
            ],
        }
    )


def gen_completions_pdf(seed: int = 19, n: int = 200) -> pd.DataFrame:
    rng = _rng(seed)
    kinds = rng.choice(["hybrid", "gpu", "cpu"], size=n, p=[0.3, 0.3, 0.4])
    numbers = rng.randint(1, 2000, n).astype("int64")
    return pd.DataFrame(
        {
            "number": numbers,
            "worker_uuid": [f"uuid-{int(i) % 60:04d}" for i in rng.randint(0, 60, n)],
            "nickname": [f"nick{int(i) % 17}" for i in rng.randint(0, 17, n)],
            "kind": kinds,
            "count": rng.randint(100, 5000, n).astype("int64"),
            "gpu_url": np.where(
                kinds == "cpu",
                np.where(
                    rng.rand(n) < 0.1,
                    ("postgres://intermediate/" + pd.Series(numbers).astype(str)).to_numpy(),
                    ("https://artifacts.example.org/rsync/" + pd.Series(numbers).astype(str)).to_numpy(),
                ),
                None,
            ),
            "epoch": (_BASE_EPOCH + 100_000 + np.arange(n, dtype="int64") * 30),
        }
    )


def synth_frontier_expr(
    spark: SparkSession, n: int, n_hosts: int = 50_000, seed: int = 1,
    open_frac: float = 1.0,
) -> DataFrame:
    """Large-scale deterministic frontier built from pure Spark expressions
    (``spark.range`` + hashes): content is independent of partitioning, no
    Python rows ever materialize — the bench-scale generator.

    ``open_frac`` < 1 marks a deterministic hash-chosen complement of
    rows completed (closed=True) — the mature-crawl shape (most of the
    table done, a thin open fringe) behind the r05 open-set-sidecar
    bench rows."""
    from pyspark.sql import functions as F

    df = spark.range(n).select(F.col("id").alias("number"))
    u = F.pmod(F.xxhash64("number", F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0
    host_idx = F.floor(F.pow(u, 3.0) * n_hosts).cast("int")  # zipf-ish skew
    closed = (
        F.pmod(F.xxhash64("number", F.lit(seed + 2)), F.lit(1_000_000))
        >= F.lit(int(open_frac * 1_000_000))
    )
    return df.select(
        "number",
        F.concat(F.lit(DIRECTORY), F.lit("shard/"), F.col("number")).alias("url"),
        F.concat(F.lit("host"), host_idx.cast("string"), F.lit(".example.com")).alias(
            "host"
        ),
        (F.pmod(F.xxhash64("number", F.lit(seed + 1)), F.lit(1000)) / 1000.0).alias(
            "priority"
        ),
        F.lit(False).alias("gpu"),
        F.lit(None).cast("string").alias("gpu_url"),
        F.lit(False).alias("pending"),
        closed.alias("closed"),
        F.lit(None).cast("string").alias("completor"),
        F.lit(None).cast("string").alias("cpu_completor"),
        F.lit(None).cast("long").alias("claim_epoch"),
    )


# --- Spark wrappers -------------------------------------------------------


def pages(spark: SparkSession, seed: int = 7, n: int = 2000) -> DataFrame:
    return spark.createDataFrame(gen_pages_pdf(seed, n), schema=schemas.PAGES)


def frontier(spark: SparkSession, seed: int = 11, n: int = 1000) -> DataFrame:
    pdf = gen_frontier_pdf(seed, n)
    pdf["claim_epoch"] = pdf["claim_epoch"].astype(object).where(pdf["claim_epoch"].notna(), None)
    return spark.createDataFrame(pdf, schema=schemas.FRONTIER)


def workers(spark: SparkSession, seed: int = 13, n: int = 60) -> DataFrame:
    pdf = gen_workers_pdf(seed, n)
    pdf["shard_number"] = pdf["shard_number"].astype(object).where(pdf["shard_number"].notna(), None)
    return spark.createDataFrame(pdf, schema=schemas.WORKERS)


def robots(spark: SparkSession, seed: int = 17, n_hosts: int = 50) -> DataFrame:
    return spark.createDataFrame(gen_robots_pdf(seed, n_hosts), schema=schemas.ROBOTS)


def completions(spark: SparkSession, seed: int = 19, n: int = 200) -> DataFrame:
    return spark.createDataFrame(gen_completions_pdf(seed, n), schema=schemas.COMPLETIONS)
