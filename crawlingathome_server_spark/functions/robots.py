"""robots.txt parsing → politeness dim table (north rule: "per-host
politeness scheduler (robots.txt rules, crawl-delay budget)").

The reference has no robots handling (its workers fetch CommonCrawl
archives, not live sites); this is our addition for the URL-frontier
role. Parsing is a vectorized pandas UDF over raw robots.txt text —
one host's file per row, numpy/C string ops inside, Arrow batches.

Semantics (REP per RFC 9309, deterministic):
- §2.2.1 group selection (r05): rules are parsed into *groups*; a group
  is headed by one or more CONSECUTIVE ``User-agent`` lines that all
  share its rules (a UA line only starts a new group after a rule line —
  the pre-r05 parser reset membership on every UA line, dropping the
  star group's rules from ``User-agent: *`` / ``User-agent: foo``
  stacks). The crawler's product token picks the MOST SPECIFIC matching
  group: longest UA token that case-insensitively prefixes the agent
  name; all groups at that specificity merge (RFC: groups sharing a UA
  are combined); no non-wildcard match falls back to the ``*`` groups;
- ``Disallow:`` / ``Allow:`` prefix rules collected (empty value = no
  rule); per url the LONGEST matching rule wins, ties and no-match
  default to allow — the REP precedence Googlebot documents (r04;
  previously Disallow-only, which wrongly dropped carve-outs like
  ``Allow: /private/public`` under ``Disallow: /private``);
- ``Crawl-delay:`` seconds parsed (default 1.0; last one in the
  selected groups wins, matching line-order semantics);
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


def _parse_groups(content: str) -> list[dict]:
    """robots.txt → rule groups: ``{agents, disallow, allow, delays}``.

    RFC 9309 §2.1: a group is one or more consecutive ``User-agent``
    lines followed by rule lines; ALL the heading UA lines share the
    group's rules, and a UA line after a rule line starts a new group
    (ADVICE r04: resetting membership per UA line dropped the earlier
    agents' rules)."""
    groups: list[dict] = []
    cur: dict | None = None
    in_ua_run = False
    for line in content.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_ua_run:
                cur = {"agents": set(), "disallow": [], "allow": [], "delays": []}
                groups.append(cur)
                in_ua_run = True
            cur["agents"].add(val.lower())
        elif cur is not None:
            in_ua_run = False
            if key == "disallow" and val:
                cur["disallow"].append(val)
            elif key == "allow" and val:
                cur["allow"].append(val)
            elif key == "crawl-delay":
                try:
                    cur["delays"].append(max(0.1, float(val)))
                except ValueError:
                    pass
    return groups


def _parse_one(
    content: str | None, agent: str = "*"
) -> tuple[float, list[str], list[str]]:
    """Parse + §2.2.1 group selection for ``agent``'s product token:
    the longest UA token that case-insensitively prefixes ``agent``
    wins; every group at that specificity merges; otherwise the ``*``
    groups; otherwise everything is allowed."""
    if not content:
        return (DEFAULT_CRAWL_DELAY_S, [], [])
    groups = _parse_groups(content)
    a = agent.lower()

    def specificity(g: dict) -> int:
        # -1 = no match; 0 = wildcard; >0 = matched token length
        best = -1
        for tok in g["agents"]:
            if tok == "*":
                best = max(best, 0)
            elif tok and a.startswith(tok):
                best = max(best, len(tok))
        return best

    specs = [specificity(g) for g in groups]
    top = max((s for s in specs if s > 0), default=None)
    if top is None:
        top = 0 if any(s == 0 for s in specs) else None
    if top is None:
        return (DEFAULT_CRAWL_DELAY_S, [], [])
    chosen = [g for g, s in zip(groups, specs) if s == top]
    disallow = sorted({r for g in chosen for r in g["disallow"]})
    allow = sorted({r for g in chosen for r in g["allow"]})
    delays = [d for g in chosen for d in g["delays"]]
    delay = delays[-1] if delays else DEFAULT_CRAWL_DELAY_S
    return (delay, disallow, allow)


def parse_robots_txt_for(agent: str = "*"):
    """Vectorized robots.txt parser bound to one crawler product token
    (the group-selection agent). Returns a pandas UDF producing
    (crawl_delay_s, disallow_prefixes, allow_prefixes); the return-type
    struct ``_PARSED`` stays module-level (Spark 4.1 pickling gotcha)."""

    @F.pandas_udf(_PARSED)
    def _udf(contents: pd.Series) -> pd.DataFrame:
        parsed = [_parse_one(c, agent) for c in contents]
        return pd.DataFrame(
            parsed,
            columns=["crawl_delay_s", "disallow_prefixes", "allow_prefixes"],
        )

    return _udf


#: default-agent parser (the ``*`` group only) — pre-r05 public surface
parse_robots_txt = parse_robots_txt_for("*")


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


def robots_fetch_targets(
    frontier: DataFrame,
    robots: DataFrame | None,
    *,
    host_col: str = "host",
    scheme: str = "http",
) -> DataFrame:
    """The robots-fetch worklist: every distinct frontier host with NO
    row in the politeness dim table yet, emitted as (host, robots_url)
    where robots_url = ``<scheme>://<host>/robots.txt`` (REP's
    well-known location). The crawl loop fetches these, feeds the
    bodies through :func:`robots_table`, and unions into the dim table
    — hosts stay on the default budget until their row lands.

    One distinct + one left-anti join on the (comparatively tiny) host
    domain; the frontier side prunes to the host column at the scan."""
    hosts = frontier.select(F.col(host_col).alias("host")).distinct()
    if robots is not None:
        hosts = hosts.join(
            robots.select("host").distinct(), on="host", how="left_anti"
        )
    return hosts.select(
        "host",
        F.concat(F.lit(f"{scheme}://"), F.col("host"), F.lit("/robots.txt")).alias(
            "robots_url"
        ),
    )


def extract_sitemaps(content: Column) -> Column:
    """``Sitemap:`` directives from robots.txt — RFC 9309 §2.2.4-style
    "other records" / sitemaps.org protocol: one absolute URL per line,
    case-insensitive key, INDEPENDENT of user-agent groups (valid
    anywhere in the file). Pure JVM regex — stays in codegen; empty
    array when none. Comments after the URL are stripped by the \\S+
    charset (URLs cannot contain whitespace)."""
    return F.regexp_extract_all(
        F.coalesce(content, F.lit("")),
        F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"),
        F.lit(1),
    )


def sitemaps_table(
    fetched: DataFrame,
    *,
    host_col: str = "host",
    content_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) → one row per advertised sitemap:
    (host, sitemap_url). The crawl-seeding companion to
    :func:`robots_table` — feed the urls to a fetcher, then
    :func:`extract_sitemap_locs` turns the XML into frontier seeds."""
    return fetched.select(
        F.col(host_col).alias("host"),
        F.explode(extract_sitemaps(F.col(content_col))).alias("sitemap_url"),
    )


def extract_sitemap_locs(xml: Column) -> Column:
    """``<loc>`` URLs from a sitemap / sitemap-index XML document
    (sitemaps.org schema) — JVM regex over the text, tolerant of
    whitespace inside the element; callers route ``<sitemapindex>``
    results back through a fetch and leaf ``<urlset>`` results into
    frontier expansion."""
    return F.transform(
        F.regexp_extract_all(
            F.coalesce(xml, F.lit("")),
            F.lit(r"(?is)<loc\s*>\s*([^<]+?)\s*</loc\s*>"),
            F.lit(1),
        ),
        lambda u: F.trim(u),
    )


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
    agent: str = "*",
) -> DataFrame:
    """(host, robots_txt) → the politeness dim table used by claim_batch
    and expand_frontier (schemas.ROBOTS shape). ``agent`` is the
    crawler's product token for RFC 9309 §2.2.1 group selection (r05);
    the default honors only the ``*`` groups."""
    parsed = fetched.select(
        F.col(host_col).alias("host"),
        parse_robots_txt_for(agent)(F.col(content_col)).alias("r"),
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
