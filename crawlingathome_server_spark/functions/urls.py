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


# --- relative-href resolution (frontier expansion, RFC 3986 §5.2-ish) ------
#
# Real pages link mostly RELATIVELY; a crawler that keeps only absolute
# hrefs loses the bulk of intra-site frontier (VERDICT r03 'what's
# missing' #1 — the reference sidesteps this only because its workers
# consume pre-built WAT link lists, README.md:5-11, which contain all
# links already resolved). Both variants implement the SAME algorithm —
# byte-parity is pytest-asserted — and agree with urllib.parse.urljoin
# on the standard cases (also pytest-asserted):
#
#   absolute href (has a scheme)      -> kept as-is
#   '//host/p' (scheme-relative)      -> base scheme + ':' + href
#   '/p' (root-relative)              -> base origin + dot-removed path
#   'p', './p', '../p' (path-relative)-> merged with base dir, dot-removed
#
# Dot-segment removal folds over split('/'): '.' skipped, '..' pops one
# segment (guarded so it never pops the root), anything else appended —
# a single JVM higher-order `aggregate`, so resolution stays inside
# whole-stage codegen (zero Python on the follow_links hot path).

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:"


def _remove_dot_segments_expr(merged: Column) -> Column:
    """Dot-segment removal over an absolute path column (starts with '/')."""
    segs = F.split(merged, "/")
    out = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, seg: F.when(seg == ".", acc)
        .when(
            seg == "..",
            # size>1 guard: never pop the leading '' (the root)
            F.when(F.size(acc) > 1, F.slice(acc, 1, F.size(acc) - 1)).otherwise(acc),
        )
        .otherwise(F.concat(acc, F.array(seg))),
    )
    path = F.array_join(out, "/")
    # a final '.'/'..' segment leaves a directory → trailing slash (RFC)
    return F.when(
        merged.rlike(r"/\.\.?$") & ~path.endswith("/"), F.concat(path, F.lit("/"))
    ).otherwise(path)


def resolve_url_expr(base: Column, href: Column) -> Column:
    """Resolve ``href`` against the page url ``base`` — builtin
    expressions only (codegen); twin of :func:`resolve_url`."""
    scheme = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    origin = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)", 1)
    base_path = F.coalesce(F.parse_url(base, F.lit("PATH")), F.lit(""))
    base_dir = F.coalesce(
        F.nullif(F.regexp_extract(base_path, r"^(.*/)", 1), F.lit("")), F.lit("/")
    )
    # split the href's query off before path work ('?' never starts a path
    # segment; '#' cannot occur — the href regex charset stops at it)
    hpath = F.regexp_replace(href, r"\?.*$", "")
    query = F.regexp_extract(href, r"(\?.*)$", 1)
    merged = (
        F.when(hpath.startswith("/"), hpath)
        .when(hpath == "", base_path)
        .otherwise(F.concat(base_dir, hpath))
    )
    return (
        F.when(href.rlike(_SCHEME_RE), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .otherwise(F.concat(origin, _remove_dot_segments_expr(merged), query))
    )


def resolve_url(base: str, href: str) -> str:
    """Python twin of :func:`resolve_url_expr` (same algorithm, byte-
    parity pytest-asserted) — the contract reference for tests/oracles."""
    import re as _re

    if _re.match(_SCHEME_RE, href):
        return href
    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)", base)
    scheme, authority = (m.group(1), m.group(2)) if m else ("", "")
    origin = f"{scheme}://{authority}" if m else ""
    if href.startswith("//"):
        return f"{scheme}:{href}"
    base_path = _re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "", base)
    base_path = _re.sub(r"[?#].*$", "", base_path)
    qpos = href.find("?")
    hpath, query = (href[:qpos], href[qpos:]) if qpos >= 0 else (href, "")
    bm = _re.match(r"^(.*/)", base_path)
    base_dir = bm.group(1) if bm else "/"
    if hpath.startswith("/"):
        merged = hpath
    elif hpath == "":
        merged = base_path
    else:
        merged = base_dir + hpath
    out: list[str] = []
    for seg in merged.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    path = "/".join(out)
    if _re.search(r"/\.\.?$", merged) and not path.endswith("/"):
        path += "/"
    return origin + path + query


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
