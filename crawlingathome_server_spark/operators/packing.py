"""Corpus shard assignment + sequence packing (training-data export).

The last step of a curation pipeline: turn the curated document set
(``corpus_docs`` — see plans/rounds.py curate mode) into the sharded,
sequence-packed layout a pretraining data loader consumes. No reference
analogue — the reference server's job ends at handing url chunks to
workers (crawlingathome-server main.py:400-452 serves chunks, never
documents); this is the downstream operator a 100 TB corpus needs.

Two packing disciplines, both deterministic under any input
partitioning (every derived quantity is a pure function of the doc key):

- :func:`pack_chunks` — GPT-style concat-and-chunk: within a shard,
  documents are laid on one token stream in shard order (each doc
  followed by ``sep_tokens`` separator tokens) and the stream is cut
  every ``seq_len`` tokens; documents may straddle cuts. Pure built-in
  expressions: one window per shard (a running SUM), so the whole
  assignment is one shuffle on ``shard`` — at 10^9 docs and 4096
  shards each window sorts ~250k rows, embarrassingly shard-parallel,
  and Catalyst keeps it in whole-stage codegen around the sort.

- :func:`pack_greedy` — no-split bin packing in shard order: a doc
  that would overflow the current pack opens the next one (docs longer
  than ``seq_len`` get a pack of their own, flagged ``oversize``).
  The accumulator RESETS on overflow, which no window aggregate
  expresses — this is the honest ``applyInPandas`` case (SURVEY §2
  custom-operator rule (b)): sequential per shard, shard-parallel
  across the cluster, one Arrow round-trip per shard group.

Shard choice hashes the doc key (decorrelated from the store's bucket
hash by a distinct seed) so export parallelism is independent of
storage layout; ``hash_mode='md5'`` swaps in the parity-family hash so
the full assignment — shard, order, offsets, pack ids — reproduces
bit-identically in the DuckDB oracle (functions/parity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.parity import md5_long
from ..functions.urls import seeded_hash64

#: decorrelates shard choice from CheckpointStore._bucket (xxhash64 with
#: no seed column) and from the claim order key (seed 0 family)
SHARD_SEED = 0x5A4D


def _shard_hash(key: Column, hash_mode: str) -> Column:
    if hash_mode == "md5":
        return md5_long(key.cast("string"))
    if hash_mode == "xxhash64":
        return seeded_hash64(key, seed=SHARD_SEED)
    raise ValueError(f"hash_mode must be 'xxhash64' or 'md5': {hash_mode}")


def assign_shards(
    docs: DataFrame,
    n_shards: int,
    key_col: str = "fingerprint",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Stamp ``shard`` (0..n_shards-1) and the within-shard ``order_key``.

    Both are pure functions of ``key_col``, so the assignment is
    identical no matter how the input is partitioned or which cluster
    size runs it — the property that makes an export resumable and its
    shards reproducible. pmod of the SAME hash that orders the shard
    keeps one hash evaluation per row (Catalyst CSEs the alias).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    h = _shard_hash(F.col(key_col), hash_mode)
    return docs.withColumn("order_key", h).withColumn(
        "shard", F.pmod(F.col("order_key"), F.lit(n_shards)).cast("int")
    )


def pack_chunks(
    docs: DataFrame,
    seq_len: int,
    *,
    n_shards: int,
    token_col: str = "n_tokens",
    key_col: str = "fingerprint",
    sep_tokens: int = 1,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Concat-and-chunk assignment: adds ``shard``, ``order_key``,
    ``stream_off`` (first token's position on the shard's stream),
    ``pack_id`` (the ``seq_len``-sized chunk that position falls in),
    ``pack_off`` (position within that chunk) and ``pack_id_last`` (the
    chunk holding the doc's final CONTENT token, separators excluded —
    ``> pack_id`` means the doc itself straddles one or more cuts; a
    doc whose last token lands exactly on a cut with only its separator
    spilling over does NOT straddle).

    One shuffle (on ``shard``), one running-sum window per shard; the
    writer downstream cuts exact sequences from (stream_off, span)
    without re-reading neighbors.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1: {seq_len}")
    out = assign_shards(docs, n_shards, key_col=key_col, hash_mode=hash_mode)
    span = (F.col(token_col) + F.lit(sep_tokens)).cast("long")
    w = (
        Window.partitionBy("shard")
        .orderBy("order_key", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # sum-inclusive minus own span = exclusive prefix sum; one window
    # frame instead of two (the -1-preceding frame plans a second sort)
    out = out.withColumn("stream_off", F.sum(span).over(w) - span)
    return (
        out.withColumn(
            "pack_id", F.floor(F.col("stream_off") / F.lit(seq_len))
        )
        .withColumn("pack_off", F.col("stream_off") % F.lit(seq_len))
        .withColumn(
            "pack_id_last",
            # greatest(n,1)-1 keeps a zero-token doc inside its own
            # pack_id instead of pack_id - 1
            F.floor(
                (
                    F.col("stream_off")
                    + F.greatest(F.col(token_col).cast("long"), F.lit(1))
                    - F.lit(1)
                )
                / F.lit(seq_len)
            ),
        )
    )


def pack_greedy(
    docs: DataFrame,
    seq_len: int,
    *,
    n_shards: int,
    token_col: str = "n_tokens",
    key_col: str = "fingerprint",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """No-split packing: adds ``shard``, ``order_key``, ``pack_id``,
    ``pack_off`` (the doc's start inside its pack) and ``oversize``
    (doc alone in a pack it overflows). Sequential by nature (the
    accumulator resets on overflow), so it runs as one pandas pass per
    shard — shard-parallel, O(shard rows) memory, and the ONLY Python
    crossing in the export path. Deterministic: same order key as
    :func:`pack_chunks`.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1: {seq_len}")
    from pyspark.sql import types as T

    out = assign_shards(docs, n_shards, key_col=key_col, hash_mode=hash_mode)
    # never .add() onto df.schema — classic PySpark hands out its CACHED
    # StructType and add() mutates it in place, desyncing df.columns
    # from the actual plan (measured: applyInPandas then fails to
    # resolve the phantom column)
    schema_out = T.StructType(
        list(out.schema.fields)
        + [
            T.StructField("pack_id", T.LongType()),
            T.StructField("pack_off", T.LongType()),
            T.StructField("oversize", T.BooleanType()),
        ]
    )
    tcol, kcol = token_col, key_col

    def _pack(pdf):
        import numpy as np

        pdf = pdf.sort_values(["order_key", kcol], kind="mergesort").reset_index(
            drop=True
        )
        toks = pdf[tcol].to_numpy()
        pack_id = np.empty(len(pdf), dtype="int64")
        pack_off = np.empty(len(pdf), dtype="int64")
        over = np.zeros(len(pdf), dtype=bool)
        cur, fill = 0, 0
        for i, n in enumerate(toks):
            if n > seq_len:
                # oversize doc: its own pack (writer truncates/splits)
                if fill > 0:
                    cur += 1
                pack_id[i], pack_off[i], over[i] = cur, 0, True
                cur, fill = cur + 1, 0
                continue
            if fill + n > seq_len:
                cur, fill = cur + 1, 0
            pack_id[i], pack_off[i] = cur, fill
            fill += n
        pdf["pack_id"], pdf["pack_off"], pdf["oversize"] = pack_id, pack_off, over
        return pdf

    return out.groupBy("shard").applyInPandas(_pack, schema=schema_out)


def export_corpus(
    docs: DataFrame,
    path: str,
    *,
    n_shards: int,
    seq_len: int | None = None,
    token_col: str = "n_tokens",
    key_col: str = "fingerprint",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Write the corpus as ``shard=K/`` parquet dirs (one file per
    shard — the repartition mirrors the store's bucket-aligned commit:
    downstream loaders list one file per shard, and re-exports don't
    snowball file counts) ordered by the pack stream when ``seq_len``
    is given. Returns the per-shard stats the export manifest records.
    """
    out = (
        pack_chunks(
            docs, seq_len, n_shards=n_shards,
            token_col=token_col, key_col=key_col, hash_mode=hash_mode,
        )
        if seq_len is not None
        else assign_shards(docs, n_shards, key_col=key_col, hash_mode=hash_mode)
    )
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "order_key", key_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    stats = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("n_tokens"),
    ]
    if seq_len is not None:
        stats.append((F.max("pack_id_last") + F.lit(1)).alias("n_packs"))
    # stats from the parquet just written, NOT from `out` — a second
    # action over the uncached pipeline would re-run the shard shuffle
    # and every per-shard window sort (the export's dominant cost) just
    # to aggregate three numbers; this is a column-pruned scan instead
    docs_spark = docs.sparkSession
    return docs_spark.read.parquet(path).groupBy("shard").agg(*stats)
