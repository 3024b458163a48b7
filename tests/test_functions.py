"""F9/F10 + webtext function tests: canonicalization, byte-identical
extraction (BASELINE.json per-row invariant), langid, tokens, fingerprint."""

import pandas as pd
from pyspark.sql import functions as F

from crawlingathome_server_spark import datagen
from crawlingathome_server_spark.functions import text as tx
from crawlingathome_server_spark.functions.urls import (
    _canon_one,
    canonicalize_url,
    canonicalize_url_expr,
)


def test_canonicalize_cases():
    cases = {
        "HTTP://WWW.Example.COM:80/a/b?z=1&a=2#frag": "http://www.example.com/a/b?a=2&z=1",
        "https://example.com:443/": "https://example.com/",
        "https://example.com:8443/x": "https://example.com:8443/x",
        "http://example.com": "http://example.com/",
        "http://example.com/a?": "http://example.com/a",
    }
    for raw, want in cases.items():
        assert _canon_one(raw) == want, raw


def test_canonicalize_udf_matches_pure(spark):
    pages = datagen.pages(spark, seed=3, n=300)
    got = (
        pages.select("url", canonicalize_url(F.col("url")).alias("canon"))
        .toPandas()
    )
    for _, r in got.iterrows():
        assert r["canon"] == _canon_one(r["url"])


def test_canonicalize_expr_agrees_on_simple_urls(spark):
    # builtin-expression hot path == pandas path on scheme://host/path?query
    # URLs — including UNSORTED query params (sort_array == Python sorted)
    df = spark.createDataFrame(
        [
            ("HTTP://Ex.COM:80/a?a=1&b=2#f",),
            ("https://ex.com:443/x?a=1",),
            ("HTTP://Ex.COM/a?b=2&a=1&c=0#frag",),
            ("http://ex.com:8080/p?z=9&y=8",),
            ("https://Ex.Com",),
            ("http://ex.com/p?b=2&&a=1",),
        ],
        ["url"],
    )
    got = df.select(
        canonicalize_url(F.col("url")).alias("py"),
        canonicalize_url_expr(F.col("url")).alias("jvm"),
    ).collect()
    for r in got:
        assert r["py"] == r["jvm"], r


def test_extract_text_byte_identical(spark):
    """The north-rule invariant: extracted text per url is byte-identical
    to the golden value (datagen embeds `text` into `html`)."""
    pages = datagen.pages(spark, seed=7, n=400)
    got = pages.select(
        "url", "text", tx.extract_text(F.col("html")).alias("extracted")
    ).collect()
    assert len(got) == 400
    # title is part of extraction; golden = "t{i} {text}" per the template
    for r in got:
        assert r["extracted"].split(" ", 1)[1] == r["text"]


def test_extract_text_jvm_twin_matches_on_fixtures(spark):
    """The codegen twin is byte-identical to the Python extractor on the
    golden fixtures (valid UTF-8, boilerplate-entity subset) — the
    contract that lets the JVM path serve as the at-scale default."""
    pages = datagen.pages(spark, seed=7, n=400)
    got = pages.select(
        tx.extract_text(F.col("html")).alias("py"),
        tx.extract_text_jvm(F.col("html")).alias("jvm"),
    ).collect()
    assert len(got) == 400
    for r in got:
        assert r["py"] == r["jvm"], (r["py"], r["jvm"])


def test_extract_text_jvm_twin_entity_subset(spark):
    """Entity handling: the documented subset decodes identically,
    including the single-pass &amp;lt; (must NOT double-decode) and
    &nbsp; (whitespace-collapsed on both paths)."""
    rows = [
        (b"<p>a &amp; b &lt; c &gt; d &quot;q&quot; &#39;s&#39;</p>",),
        (b"<p>a&amp;lt;b</p>",),  # single-pass: stays '&lt;' literally
        (b"<p>x&nbsp;y &nbsp; z</p>",),
        (b"<p>no entities at all</p>",),
        (b"<div><script>var a='<&>';</script>kept</div>",),
    ]
    df = spark.createDataFrame(rows, "html binary")
    for r in df.select(
        tx.extract_text(F.col("html")).alias("py"),
        tx.extract_text_jvm(F.col("html")).alias("jvm"),
    ).collect():
        assert r["py"] == r["jvm"], (r["py"], r["jvm"])


def test_extract_text_jvm_twin_randomized_corpus(spark):
    """300 seeded pseudo-random documents inside the twin's contract
    (valid UTF-8, boilerplate-entity subset, plain whitespace, nested/
    unclosed tags, script+style blocks, non-ASCII text): byte parity in
    one Spark batch — broad-coverage complement to the golden fixtures."""
    import random

    rng = random.Random(20240816)
    ENTS = ["&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&apos;", "&nbsp;"]
    WORDS = ["data", "über", "crawl", "日本語", "page", "día", "x<y", "a&b"]

    def doc(i: int) -> bytes:
        parts = [f"<html><head><title>doc {i}</title>"]
        if rng.random() < 0.5:
            parts.append(f"<script type='x'>if (a<{i} && b>0) {{}}</script>")
        if rng.random() < 0.3:
            parts.append("<style>p { color: red; }</style>")
        parts.append("</head><body>")
        for _ in range(rng.randint(1, 8)):
            w = [rng.choice(WORDS) for _ in range(rng.randint(0, 6))]
            if rng.random() < 0.6:
                w.insert(rng.randint(0, len(w)), rng.choice(ENTS))
            tag = rng.choice(["p", "div", "span", "li"])
            close = rng.random() < 0.8  # unclosed tags too
            ws = rng.choice([" ", "  ", "\n", "\t", "\r\n"])
            parts.append(
                f"<{tag} id='a{i}'>{ws}{' '.join(w)}{ws}" + (f"</{tag}>" if close else "")
            )
        parts.append("</body></html>")
        return "".join(parts).encode("utf-8")

    df = spark.createDataFrame([(doc(i),) for i in range(300)], "html binary")
    rows = df.select(
        tx.extract_text(F.col("html")).alias("py"),
        tx.extract_text_jvm(F.col("html")).alias("jvm"),
    ).collect()
    assert len(rows) == 300
    for r in rows:
        assert r["py"] == r["jvm"], (r["py"], r["jvm"])


def test_extract_links_jvm_twin_parity(spark):
    """Both codegen href extractors (raw + absolute-only) return exactly
    the pandas paths' links (same regex, same order) on the golden
    fixtures and on quote/case/whitespace edge cases."""
    pages = datagen.pages(spark, seed=7, n=400)
    edge = spark.createDataFrame(
        [
            (b'<a href="http://a.com/x">1</a><A HREF=\'https://b.com/y\'>2</A>',),
            (b"<a class='z' href = \"http://c.com/p?q=1&r=2\">t</a>",),
            (b'<a href="/relative/skip">r</a><a href="ftp://no.com">f</a>',),
            (b'<a href="http://frag.com/p#frag">cut at #? no: charset stops</a>',),
            (b"<a href='http://u.com/\xc3\xbcber'>unicode</a>",),
            (b"<a href='../up/one'>rel</a><a href='sib.html?x=1'>q</a>",),
            (b"no links here",),
        ],
        "html binary",
    )
    for df in (pages.select("html"), edge):
        rows = df.select(
            tx.extract_links(F.col("html")).alias("py"),
            tx.extract_links_jvm(F.col("html")).alias("jvm"),
            tx.extract_hrefs(F.col("html")).alias("py_raw"),
            tx.extract_hrefs_jvm(F.col("html")).alias("jvm_raw"),
        ).collect()
        for r in rows:
            assert list(r["py"]) == list(r["jvm"]), (r["py"], r["jvm"])
            assert list(r["py_raw"]) == list(r["jvm_raw"]), (r["py_raw"], r["jvm_raw"])


# (base, href) cases for relative-url resolution — every shape the href
# regex can emit: absolute, scheme-relative, root-relative, path-relative
# incl. ./ ../ chains past root, query-only, trailing-dot directories,
# non-http schemes, uppercase bases, ports, base urls with/without paths.
_RESOLVE_CASES = [
    ("http://a.com/p/q/doc.html", "http://b.com/x"),
    ("http://a.com/p/q/doc.html", "other.html"),
    ("http://a.com/p/q/doc.html", "./other.html"),
    ("http://a.com/p/q/doc.html", "../up.html"),
    ("http://a.com/p/q/doc.html", "../../root.html"),
    ("http://a.com/p/q/doc.html", "../../../past-root.html"),
    ("http://a.com/p/q/doc.html", "/abs/path"),
    ("http://a.com/p/q/doc.html", "/abs/../sib"),
    ("http://a.com/p/q/doc.html", "//cdn.com/lib.js"),
    ("https://a.com/p/q/", "child"),
    ("https://a.com/p/q/", "../x?a=1&b=2"),
    ("http://a.com", "rel.html"),
    ("http://a.com", "/rooted"),
    ("http://a.com:8080/p/doc", "x/y"),
    ("http://a.com/p/doc?base=q", "sib"),
    ("http://a.com/p/doc", "?only=query"),
    ("http://a.com/p/doc", "."),
    ("http://a.com/p/q/doc", ".."),
    ("http://a.com/p/doc", "a//b"),
    ("http://a.com/p/doc", "mailto:x@y.com"),
    ("http://a.com/p/doc", "javascript:void(0)"),
    ("http://a.com/p/doc", "ftp://f.com/z"),
]


def test_extract_base_jvm_twin_parity(spark):
    """extract_base (pandas) ≡ extract_base_jvm (codegen): first
    `<base href>` only, NULL when absent, quote/case/attr-order edges."""
    edge = spark.createDataFrame(
        [
            (b'<base href="http://cdn.com/root/">x',),
            (b"<BASE target='_top' HREF='/rel/dir/'>",),
            (b'<base href="http://first.com/"><base href="http://second.com/">',),
            (b'<base target="_top">no href here',),
            (b"<a href='http://not-base.com/'>a</a>",),
            (b"",),
            (None,),
        ],
        "html binary",
    )
    rows = edge.select(
        tx.extract_base(F.col("html")).alias("py"),
        tx.extract_base_jvm(F.col("html")).alias("jvm"),
    ).collect()
    expect = ["http://cdn.com/root/", "/rel/dir/", "http://first.com/",
              None, None, None, None]
    assert [r["py"] for r in rows] == expect
    assert [r["jvm"] for r in rows] == expect
    # parity on the golden corpus too
    pages = datagen.pages(spark, seed=9, n=300)
    for r in pages.select(
        tx.extract_base(F.col("html")).alias("py"),
        tx.extract_base_jvm(F.col("html")).alias("jvm"),
    ).collect():
        assert r["py"] == r["jvm"]


def test_resolve_url_jvm_python_parity(spark):
    """resolve_url_expr (codegen) ≡ resolve_url (python twin), byte-for-
    byte, across every href shape."""
    from crawlingathome_server_spark.functions import urls as U

    df = spark.createDataFrame(_RESOLVE_CASES, "base string, href string")
    rows = df.select(
        "base",
        "href",
        U.resolve_url_expr(F.col("base"), F.col("href")).alias("jvm"),
    ).collect()
    for r in rows:
        assert r["jvm"] == U.resolve_url(r["base"], r["href"]), (
            r["base"], r["href"], r["jvm"], U.resolve_url(r["base"], r["href"])
        )


def test_resolve_url_randomized_fuzz_vs_urljoin(spark):
    """600 seeded pseudo-random (base, href) pairs across every href
    shape the extractor can emit: resolve_url must agree with the stdlib
    RFC resolver (except the documented interior-empty-segment case,
    which urljoin collapses against RFC 3986 §5.2.4) AND the JVM
    expression must agree with resolve_url byte-for-byte."""
    import random
    from urllib.parse import urljoin

    from crawlingathome_server_spark.functions import urls as U

    rng = random.Random(20260817)
    segs = ["a", "bb", "Doc-1", "x_y", "über", "7", "idx.html", "..", "."]
    hosts = ["h.com", "sub.ex.org", "H0.Example.com:8080"]

    def rand_path(n):
        return "/".join(rng.choice(segs) for _ in range(n))

    def rand_base():
        scheme = rng.choice(["http", "https"])
        p = rand_path(rng.randint(0, 3))
        q = "?b=2&a=1" if rng.random() < 0.3 else ""
        return f"{scheme}://{rng.choice(hosts)}/{p}{q}" if p else f"{scheme}://{rng.choice(hosts)}{q}"

    def rand_href():
        kind = rng.random()
        p = rand_path(rng.randint(1, 4))
        q = "?q=1" if rng.random() < 0.3 else ""
        if kind < 0.15:
            return f"http://{rng.choice(hosts)}/{p}{q}"
        if kind < 0.25:
            return f"//{rng.choice(hosts)}/{p}{q}"
        if kind < 0.45:
            return f"/{p}{q}"
        if kind < 0.55:
            return f"./{p}{q}"
        if kind < 0.7:
            return f"../{p}{q}"
        return f"{p}{q}"

    cases = [(rand_base(), rand_href()) for _ in range(600)]
    for base, href in cases:
        got = U.resolve_url(base, href)
        if "//" not in href.lstrip("/"):  # documented urljoin divergence
            assert got == urljoin(base, href), (base, href, got, urljoin(base, href))
    df = spark.createDataFrame(cases, "base string, href string")
    rows = df.select(
        "base", "href", U.resolve_url_expr(F.col("base"), F.col("href")).alias("jvm")
    ).collect()
    for r in rows:
        assert r["jvm"] == U.resolve_url(r["base"], r["href"]), (r["base"], r["href"])


def test_resolve_url_matches_urljoin():
    """The shared algorithm agrees with the stdlib RFC 3986 resolver on
    all standard cases (urljoin is the independent oracle here)."""
    from urllib.parse import urljoin

    from crawlingathome_server_spark.functions.urls import resolve_url

    for base, href in _RESOLVE_CASES:
        if href.startswith(("mailto:", "javascript:")):
            continue  # urljoin special-cases unknown schemes differently
        if "//" in href.lstrip("/"):
            # urljoin collapses interior empty segments ('a//b'→'a/b');
            # RFC 3986 §5.2.4 preserves them, as we do
            continue
        assert resolve_url(base, href) == urljoin(base, href), (base, href)


def test_extract_text_jvm_documented_divergence(spark):
    """Outside the contract the twin diverges EXACTLY as documented:
    exotic named entities stay literal on the JVM path (html.unescape
    knows ~2500 names; the twin knows the boilerplate subset)."""
    df = spark.createDataFrame([(b"<p>&copy; 2020 &mdash; x</p>",)], "html binary")
    r = df.select(
        tx.extract_text(F.col("html")).alias("py"),
        tx.extract_text_jvm(F.col("html")).alias("jvm"),
    ).collect()[0]
    assert r["py"] == "© 2020 — x"
    assert r["jvm"] == "&copy; 2020 &mdash; x"


def test_extract_text_deterministic_rerun(spark):
    pages = datagen.pages(spark, seed=7, n=100).repartition(7)
    a = sorted(
        r["e"] for r in pages.select(tx.extract_text(F.col("html")).alias("e")).collect()
    )
    b = sorted(
        r["e"]
        for r in pages.repartition(3)
        .select(tx.extract_text(F.col("html")).alias("e"))
        .collect()
    )
    assert a == b


def test_lang_id_accuracy(spark):
    """Heuristic language ID recovers the generator's language for the
    4 marker languages (datagen draws words from per-language pools)."""
    pages = datagen.pages(spark, seed=5, n=500)
    got = (
        pages.filter(F.col("lang") != "nolang")
        .select("lang", tx.lang_id(F.col("text")).alias("pred"))
        .collect()
    )
    acc = sum(r["lang"] == r["pred"] for r in got) / len(got)
    assert acc > 0.95, f"langid accuracy {acc}"


def test_token_counts(spark):
    df = spark.createDataFrame([("hello world foo",), ("a,b c!",)], ["text"])
    rows = df.select(
        tx.token_count_ws(F.col("text")).alias("ws"),
        tx.token_count_bpeish(F.col("text")).alias("bpe"),
    ).collect()
    assert rows[0]["ws"] == 3 and rows[0]["bpe"] == 3
    assert rows[1]["ws"] == 2 and rows[1]["bpe"] == 5  # a , b c !


def test_token_count_bpeish_jvm_twin_parity(spark):
    """The codegen bpeish counter (the r04 driver-query path) matches the
    pandas contract reference on the documents corpus plus unicode /
    null / empty edge cases."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("text")
    edge = spark.createDataFrame(
        [("über das 日本語!",), ("a  b\tc\nd",), ("",), (None,), ("42x9",),
         ("non\xa0breaking",)],
        "text string",
    )
    for df in (docs, edge):
        rows = df.select(
            tx.token_count_bpeish(F.col("text")).alias("py"),
            tx.token_count_bpeish_jvm(F.col("text")).alias("jvm"),
        ).collect()
        for r in rows:
            assert r["py"] == r["jvm"], (r["py"], r["jvm"])


def test_fingerprint_pure(spark):
    df = spark.createDataFrame(
        [("abc",), ("abc",), ("abd",), (None,), ("",)], ["t"]
    )
    out = [r["h"] for r in df.select(tx.fingerprint(F.col("t")).alias("h")).collect()]
    assert out[0] == out[1]
    assert out[0] != out[2]
    assert out[3] is None
    assert out[4] == 0
    # order sensitivity (rolling hash, not a bag-of-chars sum)
    pair = spark.createDataFrame([("ab",), ("ba",)], ["t"])
    h = [r["h"] for r in pair.select(tx.fingerprint(F.col("t")).alias("h")).collect()]
    assert h[0] != h[1]


def test_quality_score_ranges(spark):
    pages = datagen.pages(spark, seed=9, n=200)
    rows = pages.select(tx.quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_repetition_features_exact_values(spark):
    """Gopher-style repetition filters on hand-computed texts — the
    driver oracle exercises the word/bigram columns on the (newline-free)
    documents table, so the line path and the empty-input guards are
    pinned here."""
    cases = [
        # 4 non-empty lines, 2 distinct -> dup 0.5; blank/whitespace
        # lines don't count
        ("nav\nbody one\n\n   \nnav\nbody one", 0.5),
        # no newlines: one line, nothing repeats
        ("plain text with no newlines", 0.0),
        # all lines unique
        ("a\nb\nc", 0.0),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], ["text"])
    rep = tx.repetition_features(F.col("text"))
    got = df.select(
        rep["dup_line_fraction"].alias("dl"),
        rep["dup_word_fraction"].alias("dw"),
        rep["top_bigram_share"].alias("tb"),
    ).collect()
    for (text, want_dl), r in zip(cases, got):
        assert abs(r["dl"] - want_dl) < 1e-12, (text, r["dl"])

    # word/bigram exactness: "the cat the cat sat" -> 5 words, 3 distinct
    # -> dup_word 0.4; bigrams [the cat, cat the, the cat, cat sat] ->
    # top "the cat" 2/4 = 0.5
    one = spark.createDataFrame([("the cat the cat sat",)], ["text"])
    rep1 = tx.repetition_features(F.col("text"))
    r = one.select(
        rep1["dup_word_fraction"].alias("dw"),
        rep1["top_bigram_share"].alias("tb"),
    ).first()
    assert abs(r["dw"] - 0.4) < 1e-12
    assert abs(r["tb"] - 0.5) < 1e-12

    # guards: single word has no bigrams -> 0; empty string -> all 0
    edge = spark.createDataFrame([("word",), ("",)], ["text"])
    repe = tx.repetition_features(F.col("text"))
    rows = edge.select(
        repe["dup_line_fraction"].alias("dl"),
        repe["dup_word_fraction"].alias("dw"),
        repe["top_bigram_share"].alias("tb"),
    ).collect()
    assert rows[0]["tb"] == 0.0 and rows[0]["dw"] == 0.0
    assert rows[1]["dl"] == 0.0 and rows[1]["dw"] == 0.0 and rows[1]["tb"] == 0.0


def test_fingerprint_sequential_ids_collision_free():
    """r07 regression: the old (FP_BASE=1000003, FP_MOD=10^12-11) pairing
    satisfied B^2 ≡ 6B + 2 (mod M), making decimal-carry digit deltas
    (+1,-6,-2) invisible at any position — sequential-id corpora
    collided at ~42%. The constants must keep sequential-id texts (the id
    embedded at TWO positions, the measured failure shape) collision-free,
    and must not admit tiny-coefficient linear/quadratic relations."""
    from crawlingathome_server_spark.functions.parity import FP_BASE, FP_MOD

    seen = set()
    filler = "lorem ipsum dolor sit amet " * 8
    for i in range(20_000):
        acc = 0
        for c in f"t{i} {filler}doc {i}":
            acc = (acc * FP_BASE + ord(c)) % FP_MOD
        seen.add(acc)
    assert len(seen) == 20_000

    b2 = pow(FP_BASE, 2, FP_MOD)
    for a in range(-64, 65):
        r_lin = (a * FP_BASE) % FP_MOD
        assert not (r_lin <= 64 or FP_MOD - r_lin <= 64) or a == 0
        r = (b2 - a * FP_BASE) % FP_MOD
        assert not (r <= 64 or FP_MOD - r <= 64), (a, r)
