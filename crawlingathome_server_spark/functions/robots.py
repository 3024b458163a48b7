"""robots.txt parsing → politeness dim table (north rule: "per-host
politeness scheduler (robots.txt rules, crawl-delay budget)").

The reference has no robots handling (its workers fetch CommonCrawl
archives, not live sites); this is our addition for the URL-frontier
role. Parsing is a vectorized pandas UDF over raw robots.txt text —
one host's file per row, numpy/C string ops inside, Arrow batches.

Semantics (subset of REP, deterministic):
- only the ``User-agent: *`` group is honored;
- ``Disallow:`` / ``Allow:`` prefix rules collected (empty value = no
  rule); per url the LONGEST matching rule wins, ties and no-match
  default to allow — the REP precedence Googlebot documents (r04;
  previously Disallow-only, which wrongly dropped carve-outs like
  ``Allow: /private/public`` under ``Disallow: /private``);
- ``Crawl-delay:`` seconds parsed (default 1.0);
- budget = clamp(round_seconds / crawl_delay, 1, max_budget).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_CRAWL_DELAY_S = 1.0

_PARSED = T.StructType(
    [
        T.StructField("crawl_delay_s", T.DoubleType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("allow_prefixes", T.ArrayType(T.StringType()), False),
    ]
)


def _parse_one(content: str | None) -> tuple[float, list[str], list[str]]:
    if not content:
        return (DEFAULT_CRAWL_DELAY_S, [], [])
    delay = DEFAULT_CRAWL_DELAY_S
    disallow: list[str] = []
    allow: list[str] = []
    in_star_group = False
    for line in content.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            in_star_group = val == "*"
        elif in_star_group and key == "disallow" and val:
            disallow.append(val)
        elif in_star_group and key == "allow" and val:
            allow.append(val)
        elif in_star_group and key == "crawl-delay":
            try:
                delay = max(0.1, float(val))
            except ValueError:
                pass
    return (delay, sorted(set(disallow)), sorted(set(allow)))


@F.pandas_udf(_PARSED)
def parse_robots_txt(contents: pd.Series) -> pd.DataFrame:
    """Vectorized robots.txt → (crawl_delay_s, disallow, allow)."""
    parsed = [_parse_one(c) for c in contents]
    return pd.DataFrame(
        parsed, columns=["crawl_delay_s", "disallow_prefixes", "allow_prefixes"]
    )


def _rule_matches(rule: Column, path: Column) -> Column:
    """Does one REP rule match ``path``? Rules are prefix patterns with
    the RFC 9309 §2.2.3 special characters: ``*`` matches any run of
    octets, a trailing ``$`` anchors the end. Plain rules (the vast
    majority) stay on the fast ``startswith``; wildcard/anchored rules
    translate to a Java regex per element (metachars escaped, ``*`` →
    ``.*``) and match via ``regexp_like`` with a column pattern."""
    plain = ~rule.contains("*") & ~rule.endswith("$")
    anchored = rule.endswith("$")
    body = F.when(anchored, F.substring(rule, 1, F.length(rule) - 1)).otherwise(rule)
    esc = F.regexp_replace(body, r"([.\[\]{}()+?^$|\\])", r"\\$1")
    pattern = F.concat(
        F.lit("^"),
        F.replace(esc, F.lit("*"), F.lit(".*")),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    return F.when(plain, path.startswith(rule)).otherwise(
        F.regexp_like(path, pattern)
    )


def longest_match_len(prefixes: Column, path: Column) -> Column:
    """Specificity of the most specific rule in ``prefixes`` matching
    ``path`` (-1 when none match), where specificity = rule octet length
    (RFC 9309 §2.3.2's longest-match) — one builtin ``aggregate`` fold."""
    return F.aggregate(
        F.coalesce(prefixes, F.array().cast("array<string>")),
        F.lit(-1),
        lambda acc, p: F.when(
            _rule_matches(p, path) & (F.length(p) > acc), F.length(p)
        ).otherwise(acc),
    )


def robots_disallowed(
    path: Column, disallow_prefixes: Column, allow_prefixes: Column | None = None
) -> Column:
    """REP longest-match verdict: a url is disallowed iff its longest
    matching Disallow rule is longer than its longest matching Allow
    rule (ties and no-match → allowed)."""
    dis = longest_match_len(disallow_prefixes, path)
    if allow_prefixes is None:
        return dis > F.lit(-1)
    return dis > longest_match_len(allow_prefixes, path)


def politeness_budget(
    crawl_delay_s: Column, *, round_seconds: float = 30.0, max_budget: int = 1000
) -> Column:
    """Claims allowed per host per scheduling round given its crawl delay."""
    return F.least(
        F.greatest(F.floor(F.lit(round_seconds) / crawl_delay_s), F.lit(1)),
        F.lit(max_budget),
    ).cast("int")


def robots_table(
    fetched: DataFrame,
    *,
    host_col: str = "host",
    content_col: str = "robots_txt",
    round_seconds: float = 30.0,
) -> DataFrame:
    """(host, robots_txt) → the politeness dim table used by claim_batch
    and expand_frontier (schemas.ROBOTS shape)."""
    parsed = fetched.select(
        F.col(host_col).alias("host"), parse_robots_txt(F.col(content_col)).alias("r")
    )
    return parsed.select(
        "host",
        F.col("r.crawl_delay_s").alias("crawl_delay_s"),
        politeness_budget(F.col("r.crawl_delay_s"), round_seconds=round_seconds).alias(
            "max_claims_per_round"
        ),
        F.col("r.disallow_prefixes").alias("disallow_prefixes"),
        F.col("r.allow_prefixes").alias("allow_prefixes"),
    )
