"""robots.txt parsing + politeness-budget derivation."""

from pyspark.sql import functions as F

from crawlingathome_server_spark.functions import robots as rb

SAMPLE = """
# comment
User-agent: googlebot
Disallow: /only-for-google

User-agent: *
Disallow: /private
Disallow: /admin
Allow: /private/pub
Crawl-delay: 5
"""


def test_parse_robots_pure():
    delay, dis, alw = rb._parse_one(SAMPLE)
    assert delay == 5.0
    assert dis == ["/admin", "/private"]
    assert alw == ["/private/pub"]
    assert rb._parse_one(None) == (1.0, [], [])
    assert rb._parse_one("User-agent: *\nDisallow:") == (1.0, [], [])
    assert rb._parse_one("User-agent: *\nCrawl-delay: bogus") == (1.0, [], [])


def test_agent_group_selection_matrix():
    """RFC 9309 §2.2.1 (r05): most-specific matching User-agent group
    wins (longest prefix of the product token), groups at the same
    specificity merge, no match falls back to `*`."""
    # our crawler has a dedicated group -> star rules must NOT apply
    delay, dis, alw = rb._parse_one(SAMPLE, agent="googlebot")
    assert dis == ["/only-for-google"] and alw == []
    assert delay == 1.0  # Crawl-delay: 5 lives in the star group only
    # unknown agent -> star fallback (same as the default parse)
    assert rb._parse_one(SAMPLE, agent="otherbot") == rb._parse_one(SAMPLE)

    txt = "\n".join(
        [
            "User-agent: foo",
            "Disallow: /foo-only",
            "User-agent: foobot",
            "Disallow: /foobot-only",
            "Crawl-delay: 9",
            "User-agent: foobot",  # same token again -> groups merge
            "Disallow: /foobot-extra",
            "User-agent: *",
            "Disallow: /star",
        ]
    )
    # longest-prefix: 'foobot-news' matches both 'foo' and 'foobot';
    # 'foobot' is more specific, and BOTH foobot groups merge
    delay, dis, _ = rb._parse_one(txt, agent="foobot-news")
    assert dis == ["/foobot-extra", "/foobot-only"]
    assert delay == 9.0
    # 'foox' matches only the shorter token
    assert rb._parse_one(txt, agent="foox")[1] == ["/foo-only"]
    # case-insensitive (RFC: matching MUST be case-insensitive)
    assert rb._parse_one(txt, agent="FooBot")[1] == [
        "/foobot-extra",
        "/foobot-only",
    ]


def test_consecutive_user_agent_lines_share_group():
    """ADVICE r04: UA lines heading a group ALL share its rules; a UA
    line only starts a new group after a rule line."""
    txt = "\n".join(
        [
            "User-agent: *",
            "User-agent: foo",
            "Disallow: /shared",
            "User-agent: bar",  # after a rule line -> NEW group
            "Disallow: /bar-only",
        ]
    )
    assert rb._parse_one(txt, agent="*")[1] == ["/shared"]       # star keeps rules
    assert rb._parse_one(txt, agent="foo")[1] == ["/shared"]
    assert rb._parse_one(txt, agent="bar")[1] == ["/bar-only"]
    # rules before any User-agent line belong to no group
    assert rb._parse_one("Disallow: /orphan\nUser-agent: *\nDisallow: /x")[1] == ["/x"]
    # no matching group at all -> everything allowed
    assert rb._parse_one("User-agent: foo\nDisallow: /x", agent="zzz") == (1.0, [], [])


def test_empty_disallow_group_overrides_star(spark):
    """RFC 9309 group exclusivity (VERDICT r05 #7): a specific-agent
    group consisting of ONLY an empty ``Disallow:`` (= allow-all) still
    SELECTS — the crawler follows that group exclusively and the ``*``
    group's disallows must not leak in. End-to-end through the verdict
    expression too."""
    txt = "\n".join(
        [
            "User-agent: mybot",
            "Disallow:",  # empty value: no rule, but a RULE LINE (ends the UA run)
            "User-agent: *",
            "Disallow: /",
        ]
    )
    assert rb._parse_one(txt, agent="mybot") == (1.0, [], [])
    # everyone else keeps the star group's blanket disallow
    assert rb._parse_one(txt, agent="other")[1] == ["/"]
    # the empty Disallow: line must also TERMINATE the UA run — a star
    # group opening right after it is a NEW group, not a co-heading
    dim = rb.robots_table(
        spark.createDataFrame([("h.example.com", txt)], "host string, robots_txt string"),
        agent="mybot",
    ).collect()[0]
    assert dim["disallow_prefixes"] == []
    verdict = spark.range(1).select(
        rb.robots_disallowed(
            F.lit("/anything"),
            F.lit(dim["disallow_prefixes"]).cast("array<string>"),
            F.lit(dim["allow_prefixes"]).cast("array<string>"),
        ).alias("d")
    ).collect()[0]["d"]
    assert verdict is False


def test_robots_table_agent_param(spark):
    df = spark.createDataFrame([("a.com", SAMPLE)], ["host", "robots_txt"])
    star = rb.robots_table(df, round_seconds=30).collect()[0]
    goog = rb.robots_table(df, round_seconds=30, agent="googlebot").collect()[0]
    assert star["disallow_prefixes"] == ["/admin", "/private"]
    assert goog["disallow_prefixes"] == ["/only-for-google"]
    assert goog["crawl_delay_s"] == 1.0 and goog["max_claims_per_round"] == 30


def test_robots_table(spark):
    df = spark.createDataFrame(
        [("a.com", SAMPLE), ("b.com", None), ("c.com", "User-agent: *\nCrawl-delay: 0.5")],
        ["host", "robots_txt"],
    )
    out = {r["host"]: r for r in rb.robots_table(df, round_seconds=30).collect()}
    assert out["a.com"]["crawl_delay_s"] == 5.0
    assert out["a.com"]["max_claims_per_round"] == 6  # 30/5
    assert out["a.com"]["disallow_prefixes"] == ["/admin", "/private"]
    assert out["a.com"]["allow_prefixes"] == ["/private/pub"]
    assert out["b.com"]["max_claims_per_round"] == 30  # default 1 s delay
    assert out["c.com"]["max_claims_per_round"] == 60


def test_robots_longest_match_precedence(spark):
    """REP verdicts: longest matching rule wins; ties and no-match allow."""
    df = spark.createDataFrame(
        [
            ("/private/doc", ["/private"], ["/private/pub"]),     # dis wins
            ("/private/pub/doc", ["/private"], ["/private/pub"]), # allow wins
            ("/private", ["/private"], ["/private"]),             # tie -> allow
            ("/open/doc", ["/private"], []),                      # no match
            ("/admin/x", ["/admin", "/a"], None),                 # null allow
        ],
        "path string, dis array<string>, alw array<string>",
    )
    got = [
        r["d"]
        for r in df.select(
            rb.robots_disallowed(F.col("path"), F.col("dis"), F.col("alw")).alias("d")
        ).collect()
    ]
    assert got == [True, False, False, False, True]


def test_robots_wildcard_and_anchor_rules(spark):
    """RFC 9309 §2.2.3 special characters: `*` spans octet runs, a
    trailing `$` anchors; regex metacharacters in rules stay literal."""
    cases = [
        # (path, disallow, allow, expect_disallowed)
        ("/a/doc.pdf", ["/*.pdf$"], [], True),
        ("/a/doc.pdfx", ["/*.pdf$"], [], False),      # $ anchors
        ("/a/x.pdf/view", ["/*.pdf$"], [], False),
        ("/p/mid/end", ["/p/*/end"], [], True),
        ("/p/mid/endx", ["/p/*/end"], [], True),      # no anchor: prefix-ish
        ("/q/a+b(c)", ["/q/a+b(c)"], [], True),       # metachars literal
        ("/files/sec.pdf", ["/*.pdf$"], ["/files/se"], False),  # longer allow wins
        ("/x$/literal", ["/x$"], [], False),          # trailing $ never literal
    ]
    df = spark.createDataFrame(
        [(p, d, a) for p, d, a, _ in cases],
        "path string, dis array<string>, alw array<string>",
    )
    got = [
        r["d"]
        for r in df.select(
            rb.robots_disallowed(F.col("path"), F.col("dis"), F.col("alw")).alias("d")
        ).collect()
    ]
    assert got == [want for *_, want in cases], list(zip(cases, got))


def test_robots_table_feeds_claim(spark):
    from crawlingathome_server_spark import datagen
    from crawlingathome_server_spark.operators import claim
    from crawlingathome_server_spark.sources.seed import dedup_by_number

    fr = dedup_by_number(datagen.frontier(spark, n=300))
    hosts = [r["host"] for r in fr.select("host").distinct().limit(3).collect()]
    fetched = spark.createDataFrame(
        [(h, "User-agent: *\nCrawl-delay: 15") for h in hosts], ["host", "robots_txt"]
    )
    table = rb.robots_table(fetched, round_seconds=30)  # budget 2 for these hosts
    claims = claim.claim_batch(fr, table, seed=1, default_budget=99)
    per_host = {
        r["host"]: r["n"]
        for r in claims.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    for h in hosts:
        assert per_host.get(h, 0) <= 2


def test_dashboard_snapshot(spark):
    from crawlingathome_server_spark import datagen, schemas
    from crawlingathome_server_spark.plans.rounds import dashboard_snapshot

    fr = datagen.frontier(spark, n=200)
    wk = datagen.workers(spark)
    lb = spark.createDataFrame([("a", 5, 50), ("b", 9, 90)], schema=schemas.LEADERBOARD)
    dash = dashboard_snapshot(fr, wk, lb, top_k=10)
    stats = dash["stats"].collect()[0]
    assert stats["total_jobs"] == fr.count()
    assert 0 <= stats["completion_pct"] <= 100
    top = dash["top_workers"].collect()
    assert all(r["rank_in_type"] <= 10 for r in top)
    assert all(r["uptime_human"].endswith("s") for r in top)
    lb_rows = dash["leaderboard"].collect()
    assert lb_rows[0]["nickname"] == "b"  # sorted desc by jobs


def test_sitemap_extraction(spark):
    """r05: Sitemap: directives are group-independent, case-insensitive,
    multiple allowed; sitemap XML <loc> extraction feeds frontier
    seeding — all JVM-side."""
    txt = "\n".join(
        [
            "SITEMAP: https://a.com/sm1.xml",
            "User-agent: *",
            "Disallow: /x",
            "sitemap:\thttps://a.com/sm2.xml  # trailing comment",
            "User-agent: foo",
            "Sitemap: https://cdn.other.com/sm3.xml",
        ]
    )
    df = spark.createDataFrame(
        [("a.com", txt), ("b.com", "User-agent: *\nDisallow: /"), ("c.com", None)],
        ["host", "robots_txt"],
    )
    rows = sorted(
        (r["host"], r["sitemap_url"])
        for r in rb.sitemaps_table(df).collect()
    )
    assert rows == [
        ("a.com", "https://a.com/sm1.xml"),
        ("a.com", "https://a.com/sm2.xml"),
        ("a.com", "https://cdn.other.com/sm3.xml"),
    ]
    # sitemap directives never leak into the rule groups
    parsed = rb.robots_table(df).collect()
    assert {r["host"]: r["disallow_prefixes"] for r in parsed}["a.com"] == ["/x"]

    xml = (
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/'
        'schemas/sitemap/0.9"><url><loc>https://a.com/p1</loc>'
        "<lastmod>2020-01-01</lastmod></url>"
        "<url><LOC> https://a.com/p2 </LOC></url>"
        "<url><loc>\nhttps://a.com/p3\n</loc></url></urlset>"
    )
    locs = spark.createDataFrame([(xml,), (None,), ("<urlset/>",)], "xml string")
    got = [
        list(r["locs"])
        for r in locs.select(rb.extract_sitemap_locs(F.col("xml")).alias("locs")).collect()
    ]
    assert got == [
        ["https://a.com/p1", "https://a.com/p2", "https://a.com/p3"],
        [],
        [],
    ]


def test_sitemap_locs_seed_frontier(spark):
    """End-to-end: robots Sitemap: -> fetched XML -> <loc> seeds ->
    expand_frontier schedules them (canonicalized, budgeted)."""
    import datetime as dt

    from crawlingathome_server_spark.plans.rounds import expand_frontier

    xml = (
        "<urlset><url><loc>HTTP://Seed.example.com:80/a?b=2&amp;a=1</loc></url>"
        "<url><loc>http://seed.example.com/b</loc></url></urlset>"
    )
    fetched = spark.createDataFrame([("seed.example.com", xml)], ["host", "xml"])
    seeds = fetched.select(
        F.explode(rb.extract_sitemap_locs(F.col("xml"))).alias("url"),
        F.lit(dt.datetime(2020, 9, 13, tzinfo=dt.timezone.utc)).alias("warc_ts"),
    )
    out = sorted(
        r["canon_url"]
        for r in expand_frontier(seeds, None, seed=1, default_budget=10).collect()
    )
    # &amp; stays literal (we extract text, not entity-decode — documented)
    assert out == [
        "http://seed.example.com/a?amp;a=1&b=2",
        "http://seed.example.com/b",
    ], out


def test_robots_fetch_targets(spark):
    """r05: the robots-fetch worklist = distinct frontier hosts minus
    hosts already in the dim table, at the REP well-known location."""
    from crawlingathome_server_spark import datagen
    from crawlingathome_server_spark.sources.seed import dedup_by_number

    fr = dedup_by_number(datagen.frontier(spark, n=200))
    all_hosts = {r["host"] for r in fr.select("host").distinct().collect()}
    known = sorted(all_hosts)[:3]
    rbt = rb.robots_table(
        spark.createDataFrame(
            [(h, "User-agent: *\nDisallow: /x") for h in known],
            ["host", "robots_txt"],
        )
    )
    got = {r["host"]: r["robots_url"]
           for r in rb.robots_fetch_targets(fr, rbt).collect()}
    assert set(got) == all_hosts - set(known)
    for h, u in got.items():
        assert u == f"http://{h}/robots.txt"
    # no dim table at all -> every host; empty frontier -> nothing
    assert rb.robots_fetch_targets(fr, None).count() == len(all_hosts)
    assert rb.robots_fetch_targets(fr.limit(0), rbt).count() == 0
