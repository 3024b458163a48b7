"""URL canonicalization + deterministic seeded hashing (SURVEY.md §2.9 F9/O4).

The reference picks jobs with ``ORDER BY RANDOM() LIMIT 1``
(reference: models.py:112,127 and main.py:376-378) — a full-scan sort per
claim that is neither scalable nor reproducible. We replace randomness with
*seeded hashing*: a pure function of (key, seed) gives a uniform,
deterministic shuffle order that is identical at any parallelism — the
property the two-cluster-size scaling rule needs.

Two hash families:

- ``seeded_hash64``: ``xxhash64`` (Spark built-in, JVM-side, codegen'd) —
  the production path at 10^10 URLs.
- ``oracle_hash``: a Knuth multiplicative hash in plain integer arithmetic,
  expressible identically in ANSI SQL, so DuckDB oracle queries can
  reproduce the exact claim ordering.

Canonicalization has a built-in-expression fast path (JVM, whole-stage
codegen) and a vectorized pandas-UDF path for full RFC-ish handling
(sorted query params). No per-row Python anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Knuth's 2^32 golden-ratio multiplier; bounded so bigint arithmetic cannot
# overflow for keys < 2^31 even with ANSI mode on.
_KNUTH = 2654435761
_MOD = 4294967296  # 2^32


def oracle_hash(key: Column, seed: int = 0) -> Column:
    """Deterministic pseudo-random order key, ANSI-SQL-expressible.

    SQL equivalent (DuckDB/any engine):
    ``(key * 2654435761 + seed) % 4294967296``.
    """
    return (key.cast("bigint") * F.lit(_KNUTH) + F.lit(seed)) % F.lit(_MOD)


def oracle_hash_sql(expr: str, seed: int = 0) -> str:
    """The ANSI-SQL text matching :func:`oracle_hash` for DuckDB oracles."""
    return f"(({expr}) * {_KNUTH} + {seed}) % {_MOD}"


def seeded_hash64(*cols: Column | str, seed: int = 0) -> Column:
    """xxhash64-based order key — the at-scale path (no oracle parity)."""
    return F.xxhash64(*cols, F.lit(seed))


def host_of(url: Column) -> Column:
    """Lowercased host from a URL via the built-in ``parse_url``."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def canonicalize_url_expr(url: Column) -> Column:
    """Builtin-only canonicalization — whole-stage codegen, no Python.

    Lowercases scheme+host, strips fragment, strips default ports,
    SORTS query params (``sort_array`` over the split query — UTF8
    binary order == Python's codepoint sort), drops empty params and
    trailing ``?``. Semantically equal to the pandas
    :func:`canonicalize_url` on scheme://host[:port]/path?query URLs
    (equivalence pytest-checked); the pandas variant additionally
    handles exotic authority forms (userinfo, IPv6 literals) and is kept
    as the oracle twin. This is the flagship hot path: it runs once per
    discovered URL (reference analogue: every shard URL build,
    update_db.py:46), so it must never leave the JVM.
    """
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.parse_url(no_frag, F.lit("HOST")))
    # Spark's parse_url has no PORT key — extract it from AUTHORITY
    # (host[:port]); empty string means no explicit port.
    port = F.regexp_extract(
        F.coalesce(F.parse_url(no_frag, F.lit("AUTHORITY")), F.lit("")), r":(\d+)$", 1
    )
    path = F.coalesce(F.parse_url(no_frag, F.lit("PATH")), F.lit(""))
    query = F.parse_url(no_frag, F.lit("QUERY"))
    default_port = (
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    sorted_query = F.array_join(
        F.sort_array(F.filter(F.split(query, "&"), lambda q: q != "")), "&"
    )
    query_part = F.when(
        query.isNull() | (sorted_query == ""), F.lit("")
    ).otherwise(F.concat(F.lit("?"), sorted_query))
    return F.concat(scheme, F.lit("://"), host, port_part, path_part, query_part)


def _canon_one(u: str) -> str:
    # Pure-python core used by the vectorized UDF; intentionally stdlib-only
    # and version-stable (urllib.parse semantics are frozen for these ops).
    from urllib.parse import urlsplit, urlunsplit

    try:
        parts = urlsplit(u)
    except ValueError:
        return u
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    if port is None or (scheme, port) in (("http", 80), ("https", 443)):
        netloc = host
    else:
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    query = "&".join(sorted(q for q in parts.query.split("&") if q))
    return urlunsplit((scheme, netloc, path, query, ""))


@F.pandas_udf(T.StringType())
def canonicalize_url(urls: pd.Series) -> pd.Series:
    """Full canonicalization: lowercase scheme/host, strip fragment and
    default port, sort query params. Vectorized (Arrow batches)."""
    return urls.map(_canon_one)
