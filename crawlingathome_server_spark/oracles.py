"""DuckDB oracle SQL generators for the md5-parity operator variants.

Each generator emits ANSI-ish SQL (DuckDB dialect: list comprehensions,
list_reduce, bit ops) that reproduces the corresponding Spark operator
BIT-IDENTICALLY — same md5-derived hashes (functions/parity.py), same
fold orders, same float sequences — so the driver's value-hash compare
can verify even LSH banding, simhash votes, and bloom-filter false
positives. The constants (perm params, planes) are derived from the
same seeds as the Spark side.

These are oracles, not engines: correctness spec only, quadratic-safe
at sf0.01. The Spark side is the scale path.
"""

from __future__ import annotations

from .functions.parity import FOLD_MULT, FOLD_P, md5_long_sql
from .operators.dedup import _MERSENNE, _perm_params


def fold_hash_sql(exprs: list[str]) -> str:
    acc = "CAST(0 AS BIGINT)"
    for e in exprs:
        acc = f"((({acc}) * {FOLD_MULT} + CAST({e} AS BIGINT)) % {FOLD_P})"
    return acc


def shingles_sql(words_expr: str, k: int) -> str:
    """Word k-shingles from a split-words list (mirrors dedup.shingle_expr)."""
    return (
        f"CASE WHEN len({words_expr}) < {k} THEN [array_to_string({words_expr}, ' ')] "
        f"ELSE [array_to_string({words_expr}[i:i+{k - 1}], ' ') "
        f"FOR i IN generate_series(1, len({words_expr}) - {k - 1})] END"
    )


def minhash_lsh_sql(
    *,
    table: str = "documents",
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_k: int = 3,
    seed: int = 7,
    threshold: float = 0.5,
    max_bucket: int = 200,
) -> str:
    """Mirror of dedup.minhash_dedup(mode='md5') → (a, b, jaccard)."""
    a, b = _perm_params(n_hashes, seed)
    rpb = n_hashes // n_bands
    mins = ", ".join(
        f"list_min(list_transform(hs, x -> (x * {int(a[i])} + {int(b[i])}) % {_MERSENNE}))"
        for i in range(n_hashes)
    )
    band_structs = ", ".join(
        "{'band': %d, 'bucket': %s}"
        % (
            j,
            fold_hash_sql(
                [str(j + 1)] + [f"sig[{j * rpb + r + 1}]" for r in range(rpb)]
            ),
        )
        for j in range(n_bands)
    )
    return f"""
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM {table}),
sh AS (SELECT doc_id, {shingles_sql('ws', shingle_k)} AS shingles FROM w),
hs AS (SELECT doc_id, list_transform(shingles, s -> {md5_long_sql('s')} % {_MERSENNE}) AS hs FROM sh),
sig AS (SELECT doc_id, hs, [{mins}] AS sig FROM hs),
bands AS (SELECT doc_id, unnest([{band_structs}], recursive := true) FROM sig),
capped AS (SELECT doc_id, band, bucket FROM (
    SELECT doc_id, band, bucket,
           row_number() OVER (PARTITION BY band, bucket ORDER BY doc_id) AS rn
    FROM bands) WHERE rn <= {max_bucket}),
pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM capped x JOIN capped y
          ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
dh AS (SELECT doc_id, list_distinct(hs) AS dh FROM hs)
SELECT p.a AS a, p.b AS b,
       CASE WHEN len(list_distinct(list_concat(ha.dh, hb.dh))) > 0
            THEN CAST(len(list_intersect(ha.dh, hb.dh)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(ha.dh, hb.dh))) AS DOUBLE)
            ELSE 1.0 END AS jaccard
FROM pairs p JOIN dh ha ON p.a = ha.doc_id JOIN dh hb ON p.b = hb.doc_id
WHERE CASE WHEN len(list_distinct(list_concat(ha.dh, hb.dh))) > 0
           THEN CAST(len(list_intersect(ha.dh, hb.dh)) AS DOUBLE)
                / CAST(len(list_distinct(list_concat(ha.dh, hb.dh))) AS DOUBLE)
           ELSE 1.0 END >= {threshold}
"""


def _block_ranges(n_bits: int, n_blocks: int) -> list[tuple[int, int]]:
    base, extra = divmod(n_bits, n_blocks)
    out, start = [], 0
    for i in range(n_blocks):
        width = base + (1 if i < extra else 0)
        out.append((start, width))
        start += width
    return out


def simhash_sql(
    *,
    table: str = "documents",
    n_bits: int = 56,
    max_hamming: int = 7,
    n_blocks: int | None = None,
) -> str:
    """Mirror of dedup.simhash_candidates(hash_mode='md5') → (a, b, hamming)."""
    if n_blocks is None:
        n_blocks = max_hamming + 1
    n_hex = (n_bits + 3) // 4
    bit_terms = " + ".join(
        f"CASE WHEN list_sum(list_transform(hs, x -> ((x >> {j}) & 1) * 2 - 1)) > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for j in range(n_bits)
    )
    block_structs = ", ".join(
        "{'block_idx': %d, 'block_val': ((simhash >> %d) & %d)}"
        % (i, start, (1 << width) - 1)
        for i, (start, width) in enumerate(_block_ranges(n_bits, n_blocks))
    )
    return f"""
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM {table}),
hs AS (SELECT doc_id, list_transform(ws, t -> {md5_long_sql('t', n_hex)}) AS hs FROM w),
sig AS (SELECT doc_id, ({bit_terms}) AS simhash FROM hs),
blocks AS (SELECT doc_id, simhash, unnest([{block_structs}], recursive := true) FROM sig)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
FROM blocks x JOIN blocks y
ON x.block_idx = y.block_idx AND x.block_val = y.block_val AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}
"""


def ann_lsh_sql(
    *,
    table: str = "embeddings",
    dim: int = 64,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 13,
    k: int = 10,
    probe_pred: str = "vec_id < 5",
) -> str:
    """Mirror of similarity.lsh_topk(sig_mode='pm1') with round(cos, 6)."""
    from .operators.similarity import pm1_planes

    planes = pm1_planes(dim, n_planes, seed)
    bpb = n_planes // n_bands

    def proj(p: int) -> str:
        # explicit left-associative chain == the Spark side's sequential
        # fold (0.0 + x1 + x2 + ...): identical IEEE summation order.
        return "(" + " + ".join(
            f"v[{j + 1}] * {float(planes[p][j]):.1f}" for j in range(dim)
        ) + ")"

    buckets = []
    for band in range(n_bands):
        terms = " + ".join(
            f"CASE WHEN ({proj(band * bpb + r)}) > 0 THEN {1 << r} ELSE 0 END"
            for r in range(bpb)
        )
        buckets.append("{'band': %d, 'bucket': (%s)}" % (band, terms))
    band_structs = ", ".join(buckets)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}),
sig AS (SELECT vec_id, unnest([{band_structs}], recursive := true) FROM e),
probe_sig AS (SELECT vec_id AS probe_id, band, bucket FROM sig WHERE {probe_pred}),
cand AS (SELECT DISTINCT p.probe_id, s.vec_id AS cand_id
         FROM probe_sig p JOIN sig s ON p.band = s.band AND p.bucket = s.bucket
         WHERE s.vec_id <> p.probe_id),
scored AS (SELECT c.probe_id, c.cand_id,
           round(list_dot_product(pe.v, ce.v)
                 / (sqrt(list_dot_product(pe.v, pe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 6)
           AS cosine_sim
           FROM cand c JOIN e pe ON c.probe_id = pe.vec_id JOIN e ce ON c.cand_id = ce.vec_id)
SELECT probe_id, cand_id, cosine_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine_sim DESC, cand_id) AS rn
    FROM scored) WHERE rn <= {k}
"""


def bloom_probe_sql(
    *,
    table: str = "documents",
    n_buckets: int = 64,
    bits_per_bucket: int = 1 << 17,
    k: int = 5,
    seen_pred: str = "doc_id % 2 = 0",
    url_expr: str = "concat('http://h/', doc_id)",
) -> str:
    """Mirror of urlseen build+probe with hash_mode='md5': predicts the
    partitioned bloom's exact bit pattern, hence exact maybe_seen flags
    including false positives (Kirsch–Mitzenmacher double hashing)."""
    h = md5_long_sql(url_expr)
    return f"""
WITH hashed AS (SELECT doc_id, {h} AS h FROM {table}),
ph AS (SELECT doc_id, h % {n_buckets} AS bucket,
       list_distinct([CAST(((h & 4294967295) + i * ((h >> 32) | 1)) % {bits_per_bucket} AS BIGINT)
                      FOR i IN generate_series(0, {k - 1})]) AS ps
       FROM hashed),
seen_pos AS (SELECT DISTINCT bucket, unnest(ps) AS pos FROM ph WHERE {seen_pred}),
cand_pos AS (SELECT doc_id, bucket, unnest(ps) AS pos FROM ph),
flags AS (SELECT c.doc_id, count(*) AS n_pos, count(s.pos) AS n_hit
          FROM cand_pos c LEFT JOIN seen_pos s ON c.bucket = s.bucket AND c.pos = s.pos
          GROUP BY c.doc_id)
SELECT doc_id, (n_hit = n_pos) AS maybe_seen FROM flags
"""
