"""Similarity search over embedding columns (training-data ops).

- ``brute_force_topk``: exact cosine top-k — broadcast the (small) probe
  set, stream the candidate table, window-rank per probe. The baseline.
- ``lsh_topk``: random-hyperplane LSH — each vector gets a signature of
  sign bits against seed-derived hyperplanes; candidates share a
  signature bucket (multi-probe over bands). The scale path: candidate
  generation is a bucket equi-join, never a cross join.
- ``cosine_near_dup_pairs``: embedding near-duplicate detection (cosine
  ≥ threshold) via the LSH buckets.
- ``ivf_topk``: FAISS-style IVF — MLlib-KMeans coarse quantizer,
  searches only the nprobe nearest inverted lists per probe (the second
  at-scale ANN path; exhaustive, hence exact, when nprobe=n_lists).

All vector math is numpy inside Arrow-batched pandas UDFs, or built-in
``aggregate``/``zip_with`` expressions where the plan stays JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot_expr(a: Column, b: Column) -> Column:
    """JVM-side dot product over array<double> (whole-stage codegen)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b)))


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def brute_force_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per probe. Probes broadcast; candidates
    streamed; one window-rank per probe partition."""
    e = embeddings.select(
        F.col(id_col).alias("cand_id"), as_double(F.col(vec_col)).alias("v")
    )
    p = probes.select(F.col(id_col).alias("probe_id"), as_double(F.col(vec_col)).alias("pv"))
    scored = (
        F.broadcast(p)
        .crossJoin(e)
        .filter(F.col("cand_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "cand_id",
            cosine_expr(F.col("pv"), F.col("v")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, n_planes))


def lsh_signatures(
    embeddings: DataFrame,
    *,
    dim: int,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, bucket) rows: sign-bit signature split into bands.

    One vectorized pandas pass (matrix multiply per Arrow batch); the
    hyperplanes are seed-derived, identical on every executor.
    """
    planes = _planes(dim, n_planes, seed)
    bits_per_band = n_planes // n_bands

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _sig(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = ((m @ planes) > 0).astype(np.int64)  # (batch, n_planes)
        # (batch, n_bands, bits_per_band) · 2^j — fully vectorized
        weights = (1 << np.arange(bits_per_band, dtype=np.int64))
        buckets = bits.reshape(len(m), n_bands, bits_per_band) @ weights
        return pd.Series(buckets.astype(np.int32).tolist())

    sigs = embeddings.select(
        F.col(id_col), _sig(as_double(F.col(vec_col))).alias("bands")
    )
    return sigs.select(
        id_col, F.posexplode("bands").alias("band", "bucket")
    )


def pm1_planes(dim: int, n_planes: int, seed: int = 13) -> list[list[int]]:
    """±1 hyperplanes derived from md5 — the SQL-parity plane family.

    md5 is identical in Python's hashlib, Spark, and DuckDB, so these
    planes (and therefore the sign-LSH buckets) can be reproduced
    bit-for-bit by the oracle (oracles.ann_lsh_sql). Sign LSH with
    Rademacher (±1) entries has the same locality guarantees as Gaussian
    planes (Achlioptas 2001 sparse random projections).
    """
    import hashlib

    return [
        [
            (int(hashlib.md5(f"plane:{seed}:{p}:{j}".encode()).hexdigest()[:15], 16) & 1)
            * 2
            - 1
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_signatures_pm1(
    embeddings: DataFrame,
    *,
    dim: int,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, bucket) sign-LSH rows computed entirely JVM-side with
    ±1 planes: ONE fold over the vector updates all n_planes projections
    together (projection_p = Σ_j ±v_j in array order — the same IEEE
    sequence the SQL oracle folds), and the fold's ``finish`` lambda
    packs the sign bits into band buckets. No Python, no Arrow, and a
    compact expression (the per-plane-fold formulation codegen-compiled
    n_planes copies of the traversal)."""
    planes = pm1_planes(dim, n_planes, seed)
    bits_per_band = n_planes // n_bands
    v = as_double(F.col(vec_col))
    # planes transposed: per vector element j, the ±1 signs of all planes
    planes_by_j = F.array(
        *[
            F.array(*[F.lit(float(planes[p][j])) for p in range(n_planes)])
            for j in range(dim)
        ]
    )

    def _bucket(acc: Column, band: int) -> Column:
        b = F.lit(0)
        for r in range(bits_per_band):
            b = b + F.when(
                F.element_at(acc, band * bits_per_band + r + 1) > 0, F.lit(1 << r)
            ).otherwise(F.lit(0))
        return b.cast("int")

    buckets = F.aggregate(
        F.zip_with(v, planes_by_j, lambda x, row: F.transform(row, lambda s: x * s)),
        F.array(*[F.lit(0.0)] * n_planes),
        lambda acc, c: F.zip_with(acc, c, lambda a, b: a + b),
        lambda acc: F.array(*[_bucket(acc, band) for band in range(n_bands)]),
    )
    return embeddings.select(
        F.col(id_col), F.posexplode(buckets).alias("band", "bucket")
    )


def lsh_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    *,
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sig_mode: str = "numpy",
) -> DataFrame:
    """ANN top-k: candidates = vectors sharing ≥1 LSH band bucket with the
    probe, scored exactly, ranked per probe. Recall < 1 by design; the
    bucket join replaces the cross join (the 100 TB path).

    ``sig_mode='numpy'`` (default): Gaussian planes, one BLAS matmul per
    Arrow batch — fastest for wide embeddings. ``'pm1'``: md5-derived ±1
    planes evaluated JVM-side — SQL-reproducible (the driver-checked
    variant) and Python-free."""
    from ..util import spread

    sig_fn = lsh_signatures_pm1 if sig_mode == "pm1" else lsh_signatures
    # spread ONLY the signature input (the per-vector compute that needs
    # the parallelism); the re-score side `e` below is joined/broadcast,
    # so spreading it too just added a second repartition exchange of
    # the same table (r08)
    cand_sig = sig_fn(
        spread(embeddings), dim=dim, n_planes=n_planes, n_bands=n_bands,
        seed=seed, id_col=id_col, vec_col=vec_col,
    ).withColumnRenamed(id_col, "cand_id")
    probe_sig = sig_fn(
        probes, dim=dim, n_planes=n_planes, n_bands=n_bands, seed=seed,
        id_col=id_col, vec_col=vec_col,
    ).withColumnRenamed(id_col, "probe_id")
    # probe_sig is (probes × n_bands) rows and the probe set is assumed
    # small throughout this operator (p broadcasts below) — broadcast it
    # so the candidate signatures stream through a map-side hash join
    # instead of shuffling on (band, bucket) (r08)
    cand_pairs = (
        F.broadcast(probe_sig)
        .join(cand_sig, on=["band", "bucket"])
        .filter(F.col("cand_id") != F.col("probe_id"))
        .select("probe_id", "cand_id")
        .dropDuplicates(["probe_id", "cand_id"])
    )
    e = embeddings.select(F.col(id_col).alias("cand_id"), as_double(F.col(vec_col)).alias("v"))
    p = probes.select(F.col(id_col).alias("probe_id"), as_double(F.col(vec_col)).alias("pv"))
    scored = (
        cand_pairs.join(e, on="cand_id")
        .join(F.broadcast(p), on="probe_id")
        .select("probe_id", "cand_id", cosine_expr(F.col("pv"), F.col("v")).alias("cosine_sim"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine_sim"), F.asc("cand_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    *,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs (a<b, cosine ≥ threshold) via LSH buckets."""
    sig = lsh_signatures(
        embeddings, dim=dim, n_planes=n_planes, n_bands=n_bands, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    a = sig.select(F.col(id_col).alias("a"), "band", "bucket")
    b = sig.select(F.col(id_col).alias("b"), "band", "bucket")
    pairs = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    e = embeddings.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    return (
        pairs.join(e.select(F.col(id_col).alias("a"), F.col("v").alias("va")), on="a")
        .join(e.select(F.col(id_col).alias("b"), F.col("v").alias("vb")), on="b")
        .select("a", "b", cosine_expr(F.col("va"), F.col("vb")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


# --- IVF (inverted-file) ANN: the second scale path besides sign-LSH -------


def ivf_build(
    embeddings: DataFrame,
    *,
    n_lists: int = 16,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    init_mode: str = "k-means||",
):
    """Train IVF coarse centroids (MLlib KMeans) and assign every vector
    to its inverted list. Returns (assigned_df(id, list_id), model).

    The classic FAISS-style recipe on Spark terms: centroids are a tiny
    broadcast model; assignment is one JVM-side model.transform pass;
    the inverted "lists" are just a list_id column to bucket-join on —
    at 100 TB the assignment is embarrassingly parallel and searches
    touch only nprobe/n_lists of the data.

    ``init_mode='random'`` skips the k-means|| init's extra full passes
    (init is ~2 whole-data rounds + driver collects) — the right call
    when centroid quality doesn't matter (the ``nprobe == n_lists``
    exhaustive-agreement oracle: exact under ANY centroids) or when a
    downstream re-score tolerates slightly lopsided lists.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.select(
        F.col(id_col),
        array_to_vector(as_double(F.col(vec_col))).alias("features"),
    )
    model = KMeans(
        k=n_lists, seed=seed, maxIter=max_iter, initMode=init_mode
    ).fit(feats)
    assigned = (
        model.transform(feats)
        .select(F.col(id_col), F.col("prediction").alias("list_id"))
    )
    return assigned, model


def ivf_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    *,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_sim: int | None = None,
    max_iter: int = 10,
    init_mode: str = "k-means||",
) -> DataFrame:
    """IVF ANN top-k: each probe searches only its ``nprobe`` nearest
    inverted lists (centroid distances computed against the broadcast
    centroid table with built-in array ops), candidates join on list_id,
    exact cosine re-score, window rank.

    ``round_sim`` rounds the cosine before ranking so the ranking (incl.
    tie-breaks) is bit-comparable with a brute-force run that ranks on
    the same rounded value — with ``nprobe == n_lists`` the search is
    exhaustive, so the result then EQUALS brute force row-for-row (the
    ``ivf_exact_agrees`` driver evidence)."""
    from ..util import spread

    # spread ONLY the KMeans/assignment input (see lsh_topk note, r08);
    # the candidate join below streams the raw table
    assigned, model = ivf_build(
        spread(embeddings),
        n_lists=n_lists,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
        max_iter=max_iter,
        init_mode=init_mode,
    )
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    centers_df = embeddings.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], ["list_id", "center"]
    )
    p = probes.select(F.col(id_col).alias("probe_id"), as_double(F.col(vec_col)).alias("pv"))
    # distance² to every centroid; keep the nprobe nearest lists per probe
    d2 = F.aggregate(
        F.zip_with(F.col("pv"), F.col("center"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probe_lists = (
        p.crossJoin(F.broadcast(centers_df))
        .select("probe_id", "pv", "list_id", d2.alias("d2"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("probe_id").orderBy(F.asc("d2"), F.asc("list_id"))
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("probe_id", "pv", "list_id")
    )
    cands = assigned.join(
        embeddings.select(F.col(id_col), as_double(F.col(vec_col)).alias("v")),
        on=id_col,
    ).select(F.col(id_col).alias("cand_id"), "list_id", "v")
    sim = cosine_expr(F.col("pv"), F.col("v"))
    if round_sim is not None:
        sim = F.round(sim, round_sim)
    # probe_lists is (probes × nprobe) rows — broadcast it so the big
    # candidate side streams through a hash join instead of the SMJ the
    # planner picks for the stats-less model.transform output (r08).
    # No dropDuplicates: each vector sits in exactly ONE inverted list
    # (model.transform is functional in vec_id — ids are unique by the
    # operator contract) and a probe's nprobe lists are distinct, so
    # (probe_id, cand_id) pairs are unique by construction; the old
    # dedup was a full extra exchange + sort-aggregate pair computing
    # the identity (r08; pytest-asserted unchanged output).
    scored = (
        F.broadcast(probe_lists)
        .join(cands, on="list_id")
        .filter(F.col("cand_id") != F.col("probe_id"))
        .select("probe_id", "cand_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine_sim"), F.asc("cand_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
