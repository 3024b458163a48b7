"""Partitioned Bloom-filter URL-seen set (SURVEY.md §2.6 D2).

The reference guarantees once-only processing with ``pending``/``closed``
flags + row locks (models.py:31-32,105-131) — per-row state in Postgres.
At 10^10 URLs the seen-set must be a compact, partitioned, mergeable
structure instead:

- build: ``canonical_url → xxhash64 → pmod(hash, n_buckets)`` bucket;
  per-bucket bitmap built with ``applyInPandas`` (Arrow batches, numpy
  bit-ops — no per-row Python);
- probe: candidates join their bucket's bitmap (bucketed equi-join; the
  bitmap table is ``n_buckets`` rows → broadcast at any scale, since
  n_buckets*bytes_per_bucket is the total filter size, sized to executor
  memory), then a vectorized pandas UDF tests k bit positions.

Why not ``DataFrame.stat.bloomFilter``: it collects one monolithic filter
to the driver — a 10^10-key filter at 1% FPR is ~11 GiB, fine spread over
buckets/executors, not fine as one driver object.

Double hashing g_i(x) = h1 + i*h2 (Kirsch–Mitzenmacher) derives k probe
positions from one 64-bit hash, so the whole pipeline hashes each URL
exactly once JVM-side.

Exact-membership fallback (used by tests as ground truth and valid for
small scales): a plain ``left_anti`` join vs the seen table.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.urls import seeded_hash64

_BITMAP_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("bitmap", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
    ]
)


def optimal_params(n_items: int, fpr: float = 0.01) -> tuple[int, int]:
    """(bits_per_bucket_item total m, k) for a target false-positive rate."""
    m = max(64, int(-n_items * math.log(fpr) / (math.log(2) ** 2)))
    k = max(1, round(m / max(n_items, 1) * math.log(2)))
    return m, k


def _positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(h), k) probe positions via double hashing on the u64 hash."""
    h = h.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd → full-period
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def build_seen_filter(
    urls_hashed: DataFrame,
    *,
    n_buckets: int = 64,
    bits_per_bucket: int = 1 << 17,
    k: int = 5,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Build the bucketed Bloom filter from a DF with a 64-bit hash column.

    One shuffle (by bucket), then a grouped-map pandas UDF ORs the bits of
    each bucket with numpy. Output: (bucket, bitmap:binary, n_items).
    """
    m_bits, kk = bits_per_bucket, k

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        pos = _positions(pdf[hash_col].to_numpy(), m_bits, kk)
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        byte_idx, bit_idx = pos >> 3, pos & 7
        np.bitwise_or.at(bits, byte_idx.ravel(), (1 << bit_idx.ravel()).astype(np.uint8))
        return pd.DataFrame(
            {"bucket": [bucket], "bitmap": [bits.tobytes()], "n_items": [len(pdf)]}
        )

    with_bucket = urls_hashed.withColumn(
        "bucket", F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int")
    )
    return with_bucket.groupBy("bucket").applyInPandas(_build, _BITMAP_SCHEMA)


def probe_seen_filter(
    candidates: DataFrame,
    seen_filter: DataFrame,
    *,
    n_buckets: int = 64,
    bits_per_bucket: int = 1 << 17,
    k: int = 5,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Mark candidates with ``maybe_seen`` (no false negatives).

    The filter table is small (n_buckets rows) → broadcast join; the bit
    test is one vectorized pandas UDF over (hash, bitmap).
    """
    m_bits, kk = bits_per_bucket, k

    @F.pandas_udf(T.BooleanType())
    def _test(hashes: pd.Series, bitmaps: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=bool)
        if len(hashes) == 0:
            return pd.Series(out)
        pos = _positions(hashes.to_numpy(), m_bits, kk)
        # bitmaps within a batch are few distinct objects; group to avoid
        # re-materializing the numpy view per row
        arr_cache: dict[int, np.ndarray] = {}
        for j, bm in enumerate(bitmaps):
            if bm is None:
                continue
            key = id(bm)
            bits = arr_cache.get(key)
            if bits is None:
                bits = np.frombuffer(bm, dtype=np.uint8)
                arr_cache[key] = bits
            p = pos[j]
            out[j] = bool(np.all((bits[p >> 3] >> (p & 7)) & 1))
        return pd.Series(out)

    with_bucket = candidates.withColumn(
        "bucket", F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int")
    )
    joined = with_bucket.join(F.broadcast(seen_filter), on="bucket", how="left")
    return (
        joined.withColumn(
            "maybe_seen",
            F.when(F.col("bitmap").isNull(), F.lit(False)).otherwise(
                _test(F.col(hash_col), F.col("bitmap"))
            ),
        )
        .drop("bitmap", "n_items", "bucket")
    )


def hash_urls(df: DataFrame, url_col: str = "canon_url", out_col: str = "url_hash") -> DataFrame:
    """Stamp the 64-bit url hash (xxhash64, JVM-side)."""
    return df.withColumn(out_col, seeded_hash64(F.col(url_col), seed=0))


def unseen_exact(candidates: DataFrame, seen: DataFrame, key: str = "canon_url") -> DataFrame:
    """Exact unseen set via left_anti — the test oracle for the filter."""
    return candidates.join(seen.select(key).dropDuplicates([key]), on=key, how="left_anti")
