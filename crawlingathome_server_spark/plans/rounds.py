"""Round-based scheduler engine + the flagship frontier-expansion query.

Design stance (SURVEY.md §7): the reference's request/response loop
(one HTTP call = one row mutation under a row lock) inverts into
deterministic *rounds*: round k is one Spark job over snapshot S_k that
applies, in order, the same transitions the server applies per-request —
release stale claims, apply completions, reap idle workers, claim a new
batch, refresh leaderboards/stats — and commits S_{k+1}. All randomness
is seeded hashing, so the claim sequence is identical at any parallelism
(the two-cluster-size scaling criterion) and across resume.

The flagship query (``expand_frontier``) is the crawl data path: given
crawled pages, which URLs does the crawler fetch next round? pages →
canonicalize+hash (F9) → exact dedup (D1) → URL-seen filter (D2) →
robots/politeness join (J1) → per-host budgeted claim (§2.7).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_url_expr, host_of, seeded_hash64
from ..operators import aggregates as agg
from ..operators import claim as claim_op
from ..operators import transitions as tr
from ..operators import urlseen
from ..sources.checkpoint import CheckpointStore

#: warc_ts stamped on sitemap-discovered seed urls — beyond any real
#: page capture time (year ~2242) so the first-wins dedup prefers real
#: page observations over synthetic seeds for the same canonical url
SITEMAP_SEED_TS_S = 1 << 33


def _dedup_sitemaps(df: DataFrame) -> DataFrame:
    """One row per sitemap_url with a DETERMINISTIC host (min): the same
    sitemap advertised under several hosts (robots-advertised vs nested
    index) must commit the same queue row at any parallelism (ADVICE
    r06 — dropDuplicates keeps an arbitrary row)."""
    return df.groupBy("sitemap_url").agg(F.min("host").alias("host"))


def expand_frontier(
    pages: DataFrame,
    robots: DataFrame | None,
    seen_urls: DataFrame | None = None,
    *,
    seed: int = 42,
    default_budget: int = 4,
    salt_buckets: int = 8,
    use_bloom: bool = False,
    seen_filter: tuple[DataFrame, dict] | None = None,
    follow_links: bool = False,
    extra_candidates: DataFrame | None = None,
    robots_broadcast: bool = True,
    round_caches: list | None = None,
) -> DataFrame:
    """The flagship query: next round's fetch set from crawled pages.

    Steps (ALL JVM-side — zero Python on the hot path; plan-asserted in
    tests/test_plans.py: no ArrowEvalPython/BatchEvalPython below the
    claim):
      1. canonicalize + hash each discovered URL (F9, builtin-expression
         canonicalizer incl. query-param sort);
      2. dedup exact on canonical form (D1) — first-wins by warc_ts;
      3. drop already-seen URLs (D2: bloom ``maybe_seen`` at scale or
         exact anti-join);
      4. per-host politeness claim: priority = recency hash, budget from
         robots (broadcast), salted two-phase window rank (§2.7).

    Returns (url, canon_url, host, url_hash, priority, order_key, budget).
    """
    if follow_links:
        # True frontier expansion: the candidates are the pages' outgoing
        # links (one explode), not the already-fetched page urls. Raw
        # hrefs — RELATIVE ones included, the bulk of real intra-site
        # links — resolve against the page's EFFECTIVE base (RFC 3986-ish
        # merge + dot-segment removal, functions/urls.resolve_url_expr):
        # the first `<base href>` when present (itself resolved against
        # the page url — it may be relative), else the page url (r05,
        # VERDICT r04 missing #3). Then non-http(s) schemes (mailto:,
        # javascript:, ftp:) drop out. The JVM extractor + expression
        # resolver keep this path Python-free (pandas twins
        # `extract_hrefs`/`extract_base`/`resolve_url` are the byte-level
        # references; parity tested).
        from ..functions.text import extract_base_jvm, extract_hrefs_jvm
        from ..functions.urls import resolve_url_expr

        # Projection staging matters here (both measured 2-10× on the
        # 400k-page bench):
        # 1. the html-scanning extractors must sit BELOW the explode —
        #    expressions selected alongside a generator land in the
        #    Project ABOVE Generate, i.e. run once per exploded href;
        # 2. the raw base TAG must be its own projected column before
        #    feeding resolve_url_expr — the resolver references its href
        #    argument ~30×, and inlining the html-decoding regex there
        #    duplicates it past the codegen size limit (the Project falls
        #    back to interpreted eval with no subexpression sharing).
        # CollapseProject keeps both stages: regexp over html is not
        # "cheap", so Catalyst won't re-inline multiply-referenced
        # aliases of it.
        raw = pages.select(
            "url",
            "warc_ts",
            extract_base_jvm(F.col("html")).alias("__base_tag"),
            extract_hrefs_jvm(F.col("html")).alias("__hrefs"),
        )
        with_base = raw.select(
            # when() (not coalesce) so base-less pages — the vast
            # majority — never evaluate the resolver expression at all
            F.when(
                F.col("__base_tag").isNotNull(),
                resolve_url_expr(F.col("url"), F.col("__base_tag")),
            )
            .otherwise(F.col("url"))
            .alias("__base"),
            "warc_ts",
            "__hrefs",
        )
        exploded = with_base.select(
            "__base", "warc_ts", F.explode(F.col("__hrefs")).alias("__href")
        )
        resolved = exploded.select(
            resolve_url_expr(F.col("__base"), F.col("__href")).alias("url"),
            "warc_ts",
        )
        low = F.lower(F.col("url"))
        candidates = resolved.filter(
            low.startswith("http://") | low.startswith("https://")
        )
    else:
        candidates = pages.select("url", "warc_ts")
    if extra_candidates is not None:
        # DIRECT candidates (e.g. sitemap-seeded urls, r06) join the
        # stream after link extraction — they are fetch targets
        # themselves, not documents to mine for hrefs
        candidates = candidates.unionByName(
            extra_candidates.select("url", "warc_ts")
        )

    canon = (
        candidates
        .withColumn("canon_url", canonicalize_url_expr(F.col("url")))
        .withColumn("host", host_of(F.col("canon_url")))
        .withColumn("url_hash", seeded_hash64(F.col("canon_url"), seed=0))
    )

    budget_attached = False
    if robots is not None and "disallow_prefixes" in robots.columns:
        # robots.txt prefix rules with REP longest-match precedence
        # (r04): a url is dropped iff its longest matching Disallow rule
        # beats its longest matching Allow rule — so carve-outs like
        # `Allow: /private/public` under `Disallow: /private` schedule
        # correctly. Broadcast dim join + two builtin aggregate folds
        # over the (short) prefix arrays — stays in codegen. The
        # per-host politeness BUDGET rides this same join (r07): the dim
        # used to be built + broadcast a second time inside claim_batch
        # just to attach max_claims_per_round — one dim, one broadcast.
        from ..functions.robots import robots_disallowed

        has_allow = "allow_prefixes" in robots.columns
        has_budget = "max_claims_per_round" in robots.columns
        rules = robots.select(
            "host",
            "disallow_prefixes",
            *(["allow_prefixes"] if has_allow else []),
            *(["max_claims_per_round"] if has_budget else []),
        )
        if robots_broadcast:
            rules = F.broadcast(rules)
        # __path staged as a COLUMN before the rule fold: the longest-
        # match aggregates reference ``path`` inside their lambdas, and a
        # higher-order lambda re-evaluates embedded OUTER subtrees per
        # element (NOTES r07 lambda gotcha) — passing the regexp_replace
        # expression directly would re-run the regex once per robots
        # rule per url (× 2 folds). As an attribute it's one regex per
        # url however many rules the host has.
        canon = (
            canon.withColumn(
                "__path",
                F.regexp_replace(F.col("canon_url"), r"^[a-z]+://[^/]+", ""),
            )
            .join(rules, on="host", how="left")
            .withColumn(
                "__disallowed",
                robots_disallowed(
                    F.col("__path"),
                    F.col("disallow_prefixes"),
                    F.col("allow_prefixes") if has_allow else None,
                ),
            )
            .filter(~F.col("__disallowed"))
            .drop(
                "disallow_prefixes",
                "__disallowed",
                "__path",
                *(["allow_prefixes"] if has_allow else []),
            )
        )
        budget_attached = has_budget
    # D1: exact dedup, deterministic first-wins (earliest warc_ts, then url)
    from pyspark.sql import Window

    w = Window.partitionBy("canon_url").orderBy(F.asc("warc_ts"), F.asc("url"))
    deduped = (
        canon.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    if seen_filter is not None:
        # a PREBUILT filter (e.g. loaded from the checkpoint store via
        # urlseen.load_seen_filter) — round k+1 probes what round k
        # committed instead of rebuilding from the full seen set.
        # params["kind"] selects the structure: bloom (default) or the
        # deletion-capable cuckoo variant.
        flt, params = seen_filter
        if params.get("kind") == "cuckoo":
            deduped = urlseen.probe_cuckoo_filter(
                deduped,
                flt,
                n_buckets=params["n_buckets"],
                n_rows=params["n_rows"],
            ).filter(~F.col("maybe_seen"))
        else:
            deduped = urlseen.probe_seen_filter(
                deduped,
                flt,
                n_buckets=params["n_buckets"],
                bits_per_bucket=params["bits_per_bucket"],
                k=params["k"],
            ).filter(~F.col("maybe_seen"))
    elif seen_urls is not None:
        if use_bloom:
            # auto-sized from the seen-set count (verdict item #5: a
            # mis-sized filter silently blows the FPR at 10^10 keys)
            flt, params = urlseen.build_seen_filter_auto(
                urlseen.hash_urls(seen_urls.select("canon_url"))
            )
            deduped = urlseen.probe_seen_filter(
                deduped,
                flt,
                n_buckets=params["n_buckets"],
                bits_per_bucket=params["bits_per_bucket"],
                k=params["k"],
            ).filter(~F.col("maybe_seen"))
        else:
            deduped = urlseen.unseen_exact(deduped, seen_urls)

    # politeness claim: rank within host by priority (hash of url) —
    # reuse the §2.7 operator with url_hash standing in for `number`.
    cand = deduped.withColumn(
        "number", F.col("url_hash")
    ).withColumn("priority", (F.pmod(F.col("url_hash"), F.lit(1000)) / 1000.0)).withColumn(
        "pending", F.lit(False)
    ).withColumn("closed", F.lit(False)).withColumn("gpu", F.lit(False))
    # Any claim path EXCEPT the unbounded-literal shortcut consumes the
    # candidate chain more than once (the count-split's stats/cold/hot
    # branches, or the classic narrow-rank + payload join-back), and only
    # the chain's EXCHANGES are deduped by plan reuse — the post-exchange
    # work (the D1 rank filter and above all the seen-filter cogroup's
    # Python pass) re-runs per consumer. When the caller hands us a cache
    # registry (the crawl engine's per-round cache list, released in its
    # run_round finally), pin the candidate set once instead (r08,
    # guide §1.2/§5 — measured: the probe cogroup re-execution was the
    # dominant claim-stage cost in the discovery rounds). Library/bench
    # callers that pass no registry get the uncached plan, unchanged.
    multi_consumer = (
        budget_attached
        or robots is not None
        or default_budget < claim_op.UNBOUNDED_BUDGET
    )
    if round_caches is not None and multi_consumer:
        cand = cand.cache()
        round_caches.append(cand)
    claimed = claim_op.claim_batch(
        cand,
        None if budget_attached else robots,
        seed=seed,
        stage="cpu",
        default_budget=default_budget,
        salt_buckets=salt_buckets,
        robots_broadcast=robots_broadcast,
        budget_col="max_claims_per_round" if budget_attached else None,
    )
    return claimed.select(
        "url", "canon_url", "host", "url_hash", "priority", "order_key", "budget"
    )


def dashboard_snapshot(
    frontier: DataFrame,
    workers: DataFrame,
    leaderboard: DataFrame,
    *,
    top_k: int = 50,
) -> dict[str, DataFrame]:
    """E3: the full dashboard (GET / + /data, main.py:81-164,222-270) as
    one set of DataFrames per round — replaces 6 counts + 3 top-50 scans
    + Redis counter gets with one conditional-agg pass, one window pass,
    one sort. The 30 s page cache (config.py:18) ≡ round cadence."""
    return {
        "stats": agg.frontier_stats(frontier),
        "worker_counts": agg.worker_counts(workers),
        "top_workers": agg.top_workers_per_type(workers, k=top_k).withColumn(
            "uptime_human",
            agg.humanize_duration(F.col("last_seen") - F.col("first_seen")),
        ),
        "leaderboard": agg.leaderboard_sorted(leaderboard),
        "efficiency": agg.worker_efficiency(workers),
    }


class CrawlEngine:
    """The URL-frontier crawl loop (the north rule's literal object):
    round k takes the pages crawled since round k-1, expands the
    frontier (canonicalize → dedup → URL-seen probe → politeness claim),
    and commits BOTH the claimed URLs and the updated seen-set through
    the snapshot store — so a crawl resumes exactly where it stopped,
    with per-partition lineage and counters (reference analogue: the
    pending/closed flags in Postgres, models.py:31-32).

    Seen-set maintenance is two-tier, the 10^10-URL posture:
    - ``seen_urls``: the exact set (canon_url, seen_epoch), hash-bucketed
      parquet, DELTA-committed (only the buckets touched by this round's
      claims/expirations are rewritten);
    - ``urlseen_filter``: the probe accelerator — bucketed bloom
      (default; OR-merged incrementally) or partitioned cuckoo
      (``filter_kind='cuckoo'``; inserted incrementally AND deletable).
      Either is REBUILT at double capacity from the exact set when the
      item count outgrows its sizing — a mis-sized filter silently blows
      FPR.

    ``ttl_rounds`` enables re-crawl: urls seen ≥ ttl_rounds rounds ago
    expire at the start of a round and become claimable again. The
    cuckoo filter deletes them in O(expired); the bloom falls back to a
    rebuild (it cannot forget) — the measured contrast is in bench/tests.

    ``discovery=True`` (r06, VERDICT r05 #2) drives the robots/sitemap
    DISCOVERY loop as committed round steps (reference analogue: workers
    continuously discovering new shards and update_db.py:31-41 seeding
    them). Three more store tables ride every commit:

    - ``robots_dim`` — the parsed politeness dim table (schemas.ROBOTS),
      grown by :func:`~..functions.robots.robots_table` over the bodies
      the caller fetched; used for this round's claim when the caller
      passes no explicit ``robots``;
    - ``robots_queue`` — (host, robots_url) worklist: every host this
      round claimed from that has no dim row yet (REP well-known URL,
      :func:`~..functions.robots.robots_fetch_targets`); the caller
      fetches these and passes ``robots_fetched=(host, robots_txt)``
      into the NEXT round;
    - ``sitemap_queue`` — (sitemap_url, host) worklist from ``Sitemap:``
      directives (and nested ``<sitemapindex>`` docs); the caller
      fetches these and passes ``sitemap_fetched=(sitemap_url, host,
      xml)``; leaf ``<urlset>`` locs seed the SAME round's frontier
      expansion (they flow through dedup → seen-filter → politeness
      claim like any discovered url).

    All three commit as O(delta) Appends (new/fetched rows only) with
    manifest counters (n_robots_fetched, n_sitemaps_discovered,
    n_sitemap_seeds) — resume-safe like everything else in the store.
    A host whose robots fetch failed should still be reported in
    ``robots_fetched`` with a NULL body: it parses to the allow-all
    default dim row and stops being re-queued.
    """

    #: discovery-loop table names (``discovery=True``)
    ROBOTS_DIM = "robots_dim"
    ROBOTS_QUEUE = "robots_queue"
    SITEMAP_QUEUE = "sitemap_queue"
    #: curate=True corpus table — (fingerprint, canon_url, text, lang,
    #: quality, n_tokens, curated_epoch), keyed + Append-deduped on the
    #: rolling-hash fingerprint
    CORPUS = "corpus_docs"
    #: the corpus dedup's probe accelerator (r07) — same bucketed
    #: bloom/cuckoo structure as ``urlseen_filter``, keyed on the doc
    #: fingerprint; sizing params ride the manifest counters as
    #: ``corpus_params``/``corpus_capacity``
    CORPUS_FILTER = "corpus_fp_filter"

    def __init__(
        self,
        spark: SparkSession,
        store: CheckpointStore,
        *,
        seed: int = 42,
        default_budget: int = 4,
        fpr: float = 0.01,
        rows_per_bucket: int = 4_000_000,
        filter_kind: str = "bloom",
        ttl_rounds: int | None = None,
        discovery: bool = False,
        agent: str = "*",
        round_seconds: float = 30.0,
        follow_links: bool = False,
        curate: bool = False,
        curate_langs: tuple[str, ...] | None = ("en",),
        curate_min_quality: float = 0.5,
        curate_min_chars: int = 100,
        curate_fingerprint: str = "xxhash64",
        curate_filter_min_corpus: int = 30_000_000,
        curate_max_dup_lines: float | None = None,
        curate_max_top_bigram: float | None = None,
    ):
        if filter_kind not in ("bloom", "cuckoo"):
            raise ValueError(f"filter_kind must be 'bloom' or 'cuckoo': {filter_kind}")
        self.spark = spark
        self.store = store
        self.seed = seed
        self.default_budget = default_budget
        self.fpr = fpr
        # discovery loop (r06): robots/sitemap worklists + politeness dim
        # maintained as committed round steps; agent = the crawler's
        # product token for RFC 9309 group selection, round_seconds sizes
        # the crawl-delay → per-round budget conversion
        self.discovery = discovery
        self.agent = agent
        self.round_seconds = round_seconds
        # follow_links=True: each round's candidates are the crawled
        # pages' OUTGOING hrefs (expand_frontier's explode+resolve path)
        # instead of the page urls themselves — the true frontier-
        # expansion crawl; pages then need an `html` column
        self.follow_links = follow_links
        # curate=True (r07): each round ALSO runs the training-data
        # curation pipeline over the fetched pages — JVM text extraction
        # → language gate → quality gate → fingerprint dedup (within the
        # round AND against the accumulated corpus) — and commits the
        # survivors to the `corpus_docs` table as an O(new docs) Append.
        # The crawl loop then IS the end-to-end corpus builder: claim
        # what to fetch next, curate what was fetched. Pages need `html`.
        self.curate = curate
        self.curate_langs = tuple(curate_langs) if curate_langs else None
        self.curate_min_quality = curate_min_quality
        self.curate_min_chars = curate_min_chars
        # Gopher-style repetition gates (functions/text.repetition_features;
        # Rae et al. 2021 use dup-line ≤ 0.30, top-2gram ≤ 0.20). None =
        # gate off (and its feature column is never computed).
        self.curate_max_dup_lines = curate_max_dup_lines
        self.curate_max_top_bigram = curate_max_top_bigram
        # corpus-filter probe gate: below this corpus size the exact
        # left-anti join is cheaper than the probe's ~3 s fixed cost
        # (Python bloom crossing of the round's fingerprints + the
        # confirm's bucket-collect); both paths are exact — this is
        # purely a cost knob, and the filter is MAINTAINED from the
        # first curate round either way, so crossing the threshold
        # needs no rebuild. Measured (tools/curate_filter_bench.py →
        # BENCH/curate_filter.json): local parity at ~32M corpus docs —
        # both paths pay the same column-pruned O(corpus) scan, and the
        # term the probe ELIMINATES (the exact join's corpus-wide
        # shuffle+sort) costs ~nothing on single-node tmpfs but is the
        # dominant per-round term on a network-shuffling cluster
        # (~8 GB/round at 10^9 docs). The default is the measured local
        # parity point; cluster deployments should drop it to ~4×
        # round size.
        self.curate_filter_min_corpus = curate_filter_min_corpus
        # exact-dedup key over the extracted text: 'xxhash64' (default —
        # one JVM intrinsic pass; the scale path) or 'rolling' (the
        # SQL-parity char-polynomial functions/text.fingerprint — an
        # interpreted per-codepoint higher-order fold, ~10× slower on
        # multi-KB docs; keep for oracle-reproducible corpora)
        if curate_fingerprint not in ("xxhash64", "rolling"):
            raise ValueError(
                f"curate_fingerprint must be 'xxhash64' or 'rolling': "
                f"{curate_fingerprint}"
            )
        self.curate_fingerprint = curate_fingerprint
        # filter_kind='cuckoo' swaps the seen-filter for the partitioned
        # cuckoo filter (urlseen.build_cuckoo_filter): ~0.01% FPR and
        # O(expired) incremental DELETION. ttl_rounds enables re-crawl:
        # urls seen more than ttl_rounds scheduling rounds ago expire at
        # the start of a round and become claimable again — cuckoo
        # deletes them from the filter incrementally; bloom (which
        # cannot forget) falls back to a full rebuild from the exact
        # set whenever anything expired.
        self.filter_kind = filter_kind
        self.ttl_rounds = ttl_rounds
        # auto re-bucketing threshold: when the seen-set outgrows
        # rows_per_bucket × n_partitions, the post-round compaction
        # doubles the bucket count until it fits — a store sized at 8
        # buckets for 10^8 keys doesn't keep 8 buckets at 10^10
        # (VERDICT r2 'what's missing' #4). Compaction is a full rewrite,
        # so it happens at doubling cadence (amortized O(1) per row),
        # exactly like the bloom-filter capacity rebuild below.
        self.rows_per_bucket = rows_per_bucket

    def bootstrap(self, *, round_epoch: int = 0) -> int:
        from pyspark.sql import types as T

        empty = self.spark.createDataFrame(
            [],
            schema=T.StructType(
                [
                    T.StructField("canon_url", T.StringType(), False),
                    # when each url was first claimed — drives ttl_rounds
                    # expiry (re-crawl); harmless bookkeeping otherwise
                    T.StructField("seen_epoch", T.LongType(), False),
                ]
            ),
        )
        return self.store.commit(
            {"seen_urls": empty},
            seed=self.seed,
            round_epoch=round_epoch,
            counters={"n_seen": 0, "crawl_capacity": 0},
        )

    # -- filter helpers (bloom | cuckoo behind one shape) -------------------

    def _build_filter(
        self, urls: DataFrame, capacity: int, key_col: str = "canon_url"
    ):
        """(filter_df, params) sized for ``capacity`` items. ``key_col``
        names the column to hash — canon_url for the seen-set, the int64
        ``fingerprint`` for the corpus filter (xxhash64 re-hashes either
        type uniformly)."""
        hashed = urlseen.hash_urls(urls, url_col=key_col)
        if self.filter_kind == "cuckoo":
            params = {**urlseen.auto_cuckoo_params(capacity), "kind": "cuckoo"}
            flt = urlseen.build_cuckoo_filter(
                hashed, n_buckets=params["n_buckets"], n_rows=params["n_rows"]
            )
        else:
            params = {**urlseen.auto_params(capacity, self.fpr), "kind": "bloom"}
            flt = urlseen.build_seen_filter(
                hashed,
                n_buckets=params["n_buckets"],
                bits_per_bucket=params["bits_per_bucket"],
                k=params["k"],
            )
        return flt, params

    def _filter_delta_rows(
        self,
        flt: DataFrame,
        new_urls: DataFrame,
        expired_keys: DataFrame | None,
        params: dict,
        key_col: str = "canon_url",
    ) -> DataFrame:
        """The filter table's delta-commit row set for a grow round:
        every bucket touched by this round's inserts (and, for
        deletion-capable kinds, by expirations) with its updated content.

        This is the delta-commit shape: at 10^10 urls the filter is
        ~10^4 buckets × 1 MiB, and rewriting (or even re-OR-ing) the
        untouched ones every round is the kind of per-round full pass
        this engine exists to avoid. Hashing/bucket jobs run once per
        input here and are shared down the kind-specific paths.
        ``expired_keys`` is only ever non-None for kinds that delete
        in place (cuckoo); a bloom expiry forces a rebuild upstream."""
        hashed = urlseen.hash_urls(new_urls, url_col=key_col)
        if params.get("kind") == "cuckoo":
            ids = urlseen.touched_buckets(hashed, n_buckets=params["n_buckets"])
            changed = urlseen.insert_into_cuckoo(
                flt,
                hashed,
                n_buckets=params["n_buckets"],
                n_rows=params["n_rows"],
                touched_only=True,
                buckets=ids,
            )
            if expired_keys is not None:
                # buckets touched ONLY by deletions carry no new urls,
                # but their (already-deleted-from) tables must still
                # commit — flt here is the post-delete filter
                del_only = urlseen.touched_buckets(
                    urlseen.hash_urls(expired_keys, url_col=key_col),
                    n_buckets=params["n_buckets"],
                ).join(ids, on="bucket", how="left_anti")
                changed = changed.unionByName(
                    flt.join(F.broadcast(del_only), on="bucket", how="left_semi")
                )
            return changed
        # bloom: ONE cogroup sets the batch's bits straight into the
        # parent's touched bitmaps (r08) — replaces the build-delta +
        # OR-merge pair (two shuffles + two grouped-pandas passes per
        # round); bit-identical composition, pytest-asserted
        return urlseen.insert_into_bloom(
            flt,
            hashed,
            n_buckets=params["n_buckets"],
            bits_per_bucket=params["bits_per_bucket"],
            k=params["k"],
        )

    def _probe_filter(
        self, hashed: DataFrame, flt: DataFrame, params: dict
    ) -> DataFrame:
        """Stamp ``maybe_seen`` on ``hashed`` (column ``url_hash``) via the
        kind-appropriate probe — the expand_frontier branch factored out
        so the corpus filter reuses it."""
        if params.get("kind") == "cuckoo":
            return urlseen.probe_cuckoo_filter(
                hashed,
                flt,
                n_buckets=params["n_buckets"],
                n_rows=params["n_rows"],
            )
        return urlseen.probe_seen_filter(
            hashed,
            flt,
            n_buckets=params["n_buckets"],
            bits_per_bucket=params["bits_per_bucket"],
            k=params["k"],
        )

    # -- curation (r07) ----------------------------------------------------

    def corpus(self, spark: SparkSession | None = None) -> DataFrame:
        """The accumulated curated corpus (empty until a curate round)."""
        from .. import schemas

        spark = spark or self.spark
        snap = self.store.latest_snapshot_id()
        if snap is None or self.CORPUS not in self.store.read_manifest(snap)["tables"]:
            return spark.createDataFrame([], schemas.CORPUS)
        return self.store.read(spark, self.CORPUS)

    def export_corpus(
        self,
        path: str,
        *,
        n_shards: int,
        seq_len: int | None = None,
        hash_mode: str = "xxhash64",
    ) -> DataFrame:
        """Export the accumulated corpus as the sharded (and, with
        ``seq_len``, sequence-packed) training-data layout
        (operators/packing.export_corpus) and return the per-shard stats
        table. The shard/order/pack assignment is a pure function of the
        doc fingerprint, so re-exporting after more crawl rounds only
        APPENDS new docs into their (stable) shards and offsets shift
        deterministically — a resumable export, same guarantee the
        store's commits give the crawl state."""
        from ..operators import packing

        return packing.export_corpus(
            self.corpus(),
            path,
            n_shards=n_shards,
            seq_len=seq_len,
            token_col="n_tokens",
            key_col="fingerprint",
            hash_mode=hash_mode,
        )

    def _curate_pages(
        self,
        pages: DataFrame,
        round_epoch: int,
        parent_tables: dict,
        corpus_filter: tuple[DataFrame, dict] | None = None,
    ) -> tuple[DataFrame, DataFrame | None]:
        """The round's curation pipeline over the FETCHED pages (curate
        what was fetched; claim what to fetch next): JVM text extraction
        → language gate → quality gate → within-round fingerprint dedup
        (deterministic min canon_url per fingerprint) → cross-round dedup
        against the accumulated corpus.

        Cross-round dedup is filter-first (r07, mirroring the url
        seen-set): probe the persisted ``corpus_fp_filter`` with the
        round's fingerprints — probe-NEGATIVES are definitely new (no
        false negatives), so only the probe-positives (true dups + the
        FPR share) need the exact confirm, a point-read of just the
        corpus buckets those fingerprints hash into. Per-round dedup cost
        is O(round docs) probe + O(dup share) confirm — never a shuffle
        or even a scan of the full corpus, which the previous full
        left-anti join paid every round (O(corpus) at 10^9+ docs).
        Only the filter's absence (a pre-filter store resumed, or the
        first curate round) falls back to the exact full anti-join.

        Returns ``(new corpus rows, cache handles)`` — the handles (the
        gated doc set and the probe-positive set, cached here because
        the confirm's bucket derivation is an eager action and neither
        the extract chain nor the filter probe must run twice) are the
        CALLER's to unpersist after materializing the result."""
        from ..functions import text as tx

        # Projection staging (the measured expand_frontier trap, worse
        # here): a min-length FILTER directly on the extracted text gets
        # its predicate SUBSTITUTED below the projection by
        # PushDownPredicates, so the whole 3-regex extract chain re-runs
        # inside the filter per conjunct (measured: `decode` appeared 3×
        # in the plan). Instead: (1) a cheap html-length prefilter that
        # pushes to the scan harmlessly (text ⊆ html, so short html can
        # never pass the text gate); (2) extract staged in its own
        # select — multi-referenced non-cheap alias, so CollapseProject
        # keeps the stage; (3) ALL text-derived gates applied ABOVE the
        # dedup window, which is a pushdown barrier for non-partition
        # columns — every document is extracted and featurized exactly
        # once. Gate order is sound because a fingerprint group has
        # identical text → identical gate verdicts.
        docs = pages.filter(
            F.length("html") >= F.lit(self.curate_min_chars)
        ).select(
            canonicalize_url_expr(F.col("url")).alias("canon_url"),
            tx.extract_text_jvm(F.col("html")).alias("text"),
        )
        fp = (
            F.xxhash64("text")
            if self.curate_fingerprint == "xxhash64"
            else tx.fingerprint(F.col("text"))
        )
        rep_cols = []
        if self.curate_max_dup_lines is not None or self.curate_max_top_bigram is not None:
            rep = tx.repetition_features(F.col("text"))
            if self.curate_max_dup_lines is not None:
                rep_cols.append(rep["dup_line_fraction"].alias("__dup_lines"))
            if self.curate_max_top_bigram is not None:
                rep_cols.append(rep["top_bigram_share"].alias("__top_bigram"))
        # lang scores staged in their own projection (r08): the argmax
        # when-chain re-references each score several times; staged
        # attributes make that free (see functions/text.lang_id_from_scores)
        docs = docs.select(
            "canon_url",
            "text",
            *[
                tx.lang_score(F.col("text"), lang).alias(f"__ls_{lang}")
                for lang in tx.LANG_MARKERS
            ],
        ).select(
            "canon_url",
            "text",
            tx.lang_id_from_scores(
                {lang: F.col(f"__ls_{lang}") for lang in tx.LANG_MARKERS}
            ).alias("lang"),
            tx.quality_score(F.col("text")).alias("quality"),
            tx.token_count_ws(F.col("text")).alias("n_tokens"),
            fp.alias("fingerprint"),
            *rep_cols,
        )
        w = Window.partitionBy("fingerprint").orderBy("canon_url")
        docs = (
            docs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        docs = docs.filter(
            F.col("text").isNotNull()
            & (F.length("text") >= F.lit(self.curate_min_chars))
            & (F.col("quality") >= F.lit(self.curate_min_quality))
        )
        if self.curate_max_dup_lines is not None:
            docs = docs.filter(
                F.col("__dup_lines") <= F.lit(self.curate_max_dup_lines)
            ).drop("__dup_lines")
        if self.curate_max_top_bigram is not None:
            docs = docs.filter(
                F.col("__top_bigram") <= F.lit(self.curate_max_top_bigram)
            ).drop("__top_bigram")
        if self.curate_langs is not None:
            docs = docs.filter(F.col("lang").isin(*self.curate_langs))
        caches: list[DataFrame] = []
        if corpus_filter is not None:
            flt, params = corpus_filter
            # both the probe chain and the final row set re-derive from
            # the gated docs; the bucket derivation below is an EAGER
            # collect, so without this cache the 3-regex extract chain
            # would run once there and again at the caller's count
            docs = docs.cache()
            caches.append(docs)
            hashed = urlseen.hash_urls(
                docs.select("fingerprint"), url_col="fingerprint"
            )
            pos = (
                self._probe_filter(hashed, flt, params)
                .filter(F.col("maybe_seen"))
                .select("fingerprint")
                # cached because it feeds TWO actions: read_buckets'
                # eager bucket derivation here, and the dup_fps
                # broadcast inside the final row set — without it the
                # filter-table probe join re-executes at the caller's
                # materialization (measured as a 2x on the probe's
                # fixed cost)
                .cache()
            )
            caches.append(pos)
            # exact confirm over ONLY the corpus buckets the positives
            # hash into (store point-read, fingerprint column pruned);
            # positives broadcast — the corpus side streams, never
            # shuffles
            seen_fps = self.store.read_buckets(
                self.spark,
                self.CORPUS,
                keys=pos,
                columns=("fingerprint",),
            )
            dup_fps = seen_fps.join(
                F.broadcast(pos), on="fingerprint", how="left_semi"
            )
            docs = docs.join(
                F.broadcast(dup_fps), on="fingerprint", how="left_anti"
            )
        elif self.CORPUS in parent_tables:
            # no filter yet (first curate round commits one; a pre-filter
            # store's first resumed round lands here once) — exact full
            # anti-join against the corpus fingerprints
            docs = docs.join(
                self.store.read(self.spark, self.CORPUS).select("fingerprint"),
                on="fingerprint",
                how="left_anti",
            )
        return docs.select(
            "fingerprint",
            "canon_url",
            "text",
            "lang",
            "quality",
            "n_tokens",
            F.lit(round_epoch).cast("long").alias("curated_epoch"),
        ), caches

    # -- discovery loop (r06) ----------------------------------------------

    def robots_worklist(self, spark: SparkSession | None = None) -> DataFrame:
        """(host, robots_url) the caller's fetcher should fetch before the
        next round (empty until a discovery round has run)."""
        return self._worklist(spark, self.ROBOTS_QUEUE, "ROBOTS_QUEUE")

    def sitemap_worklist(self, spark: SparkSession | None = None) -> DataFrame:
        """(sitemap_url, host) sitemap documents awaiting a fetch."""
        return self._worklist(spark, self.SITEMAP_QUEUE, "SITEMAP_QUEUE")

    def _worklist(self, spark, table: str, schema_name: str) -> DataFrame:
        from .. import schemas

        spark = spark or self.spark
        snap = self.store.latest_snapshot_id()
        if (
            snap is None
            or table not in self.store.read_manifest(snap)["tables"]
        ):
            # before the first discovery round the queue tables don't
            # exist yet — an empty worklist, not an error
            return spark.createDataFrame([], getattr(schemas, schema_name))
        return self.store.read(spark, table)

    def _discovery_ingest(
        self,
        parent_manifest: dict,
        robots_fetched: DataFrame | None,
        sitemap_fetched: DataFrame | None,
        round_epoch: int,
    ) -> dict:
        """Pre-claim discovery step: parse fetched robots bodies into the
        politeness dim table, queue advertised (and nested-index) sitemap
        urls, and turn leaf ``<urlset>`` locs into this round's frontier
        seeds. Returns the working state :meth:`_discovery_finish` closes
        out after the claim (the robots worklist needs the claimed host
        set). All table updates are O(fetched + discovered) Appends."""
        from .. import schemas
        from ..functions import robots as rb

        spark, store = self.spark, self.store
        parent_tables = parent_manifest["tables"]

        def _read_or_empty(name: str, schema) -> DataFrame:
            if name in parent_tables:
                return store.read(spark, name)
            return spark.createDataFrame([], schema)

        dim = _read_or_empty(self.ROBOTS_DIM, schemas.ROBOTS)
        rqueue = _read_or_empty(self.ROBOTS_QUEUE, schemas.ROBOTS_QUEUE)
        squeue = _read_or_empty(self.SITEMAP_QUEUE, schemas.SITEMAP_QUEUE)
        caches: list[DataFrame] = []
        n_robots_fetched = n_sitemaps_discovered = n_sitemap_seeds = 0
        new_dim = fetched_hosts = None
        new_sitemaps = fetched_sitemaps = seeds = None

        dim_rows_delta = 0
        if robots_fetched is not None:
            robots_fetched = robots_fetched.dropDuplicates(["host"]).cache()
            caches.append(robots_fetched)
            n_robots_fetched = robots_fetched.count()
            fetched_hosts = robots_fetched.select("host")
            # exact net dim growth for the upsert layer's row accounting
            # (r08): a re-fetched host REPLACES its dim row, so inserts =
            # fetched − already-present. One tiny semi-join count against
            # the parent dim (zero when the dim is still empty).
            n_replaced = (
                fetched_hosts.join(
                    dim.select("host"), on="host", how="left_semi"
                ).count()
                if parent_tables.get(self.ROBOTS_DIM, {}).get("total_rows")
                or parent_tables.get(self.ROBOTS_DIM, {}).get("delta_layers")
                else 0
            )
            dim_rows_delta = n_robots_fetched - n_replaced
            # a failed fetch (NULL body) parses to the allow-all default
            # row — the host leaves the queue either way. CACHE the
            # parsed rows: the dim plan feeds the rules join, the budget
            # join, the Append layer write, and the worklist anti-join —
            # without the cache each re-runs the pandas-UDF parse of
            # every body (measured ~4× the whole ingestion cost)
            new_dim = rb.robots_table(
                robots_fetched, agent=self.agent, round_seconds=self.round_seconds
            ).cache()
            caches.append(new_dim)
            dim = dim.join(fetched_hosts, on="host", how="left_anti").unionByName(
                new_dim
            )
            rqueue = rqueue.join(fetched_hosts, on="host", how="left_anti")
            new_sitemaps = _dedup_sitemaps(
                rb.sitemaps_table(robots_fetched).select("sitemap_url", "host")
            )

        if sitemap_fetched is not None:
            sitemap_fetched = sitemap_fetched.cache()
            caches.append(sitemap_fetched)
            fetched_sitemaps = sitemap_fetched.select("sitemap_url")
            # xml-scanning expressions go in a select BELOW the explode —
            # selected alongside a generator they land in the Project
            # ABOVE Generate and re-run once per extracted <loc> (the
            # measured staging trap documented at expand_frontier; a 50k-
            # entry sitemap would regex-scan its whole document 50k times)
            staged = sitemap_fetched.select(
                "sitemap_url",
                "host",
                F.col("xml").rlike(r"(?is)<\s*sitemapindex").alias("__idx"),
                rb.extract_sitemap_locs(F.col("xml")).alias("__locs"),
            )
            locs = staged.select(
                "sitemap_url",
                "host",
                "__idx",
                F.explode(F.col("__locs")).alias("loc"),
            )
            # a <sitemapindex> doc's locs are MORE sitemaps (queue them);
            # a leaf <urlset> doc's locs are page urls (seed them — they
            # flow through dedup → seen filter → politeness claim)
            nested = _dedup_sitemaps(
                locs.filter(F.col("__idx")).select(
                    F.col("loc").alias("sitemap_url"), "host"
                )
            )
            new_sitemaps = (
                nested
                if new_sitemaps is None
                else _dedup_sitemaps(new_sitemaps.unionByName(nested))
            )
            seeds = (
                locs.filter(~F.col("__idx"))
                .select(
                    F.col("loc").alias("url"),
                    # far-future sentinel, NOT the round epoch (ADVICE
                    # r06): first-wins dedup keeps the EARLIEST warc_ts
                    # per canon_url, so an epoch-stamped seed (1970-era
                    # for small epochs) would silently beat every real
                    # page candidate for the same url; with the sentinel
                    # a real page observation always wins the tie and
                    # seeds only represent urls nothing else saw
                    F.timestamp_seconds(F.lit(SITEMAP_SEED_TS_S)).alias("warc_ts"),
                )
                .cache()
            )
            caches.append(seeds)
            n_sitemap_seeds = seeds.count()

        if new_sitemaps is not None:
            # already-queued and just-fetched urls don't re-enter
            new_sitemaps = new_sitemaps.join(
                squeue.select("sitemap_url"), on="sitemap_url", how="left_anti"
            )
            if fetched_sitemaps is not None:
                new_sitemaps = new_sitemaps.join(
                    fetched_sitemaps, on="sitemap_url", how="left_anti"
                )
            new_sitemaps = new_sitemaps.cache()
            caches.append(new_sitemaps)
            n_sitemaps_discovered = new_sitemaps.count()
            squeue = squeue.unionByName(new_sitemaps)
            if fetched_sitemaps is not None:
                squeue = squeue.join(
                    fetched_sitemaps, on="sitemap_url", how="left_anti"
                )
        elif fetched_sitemaps is not None:
            squeue = squeue.join(fetched_sitemaps, on="sitemap_url", how="left_anti")

        dim_meta = parent_tables.get(self.ROBOTS_DIM, {})
        # a live upsert layer can leave total_rows inexact (r08) — any
        # layer rows mean the dim has content even when the base total
        # reads 0, so check both before deciding the dim is empty
        dim_rows_parent = dim_meta.get("total_rows", 0) or sum(
            ly.get("rows", 0) for ly in dim_meta.get("delta_layers") or []
        )
        if dim_rows_parent or n_robots_fetched:
            # the round's working dim feeds the rules+budget claim join
            # AND the worklist anti-join — cache it for the round (the
            # parquet base re-read + union re-plan are otherwise paid per
            # consumer); released with the other round caches in the
            # run_round finally
            dim = dim.cache()
            caches.append(dim)
        return {
            "dim": dim,
            "dim_nonempty": bool(dim_rows_parent or n_robots_fetched),
            "rqueue": rqueue,
            "squeue": squeue,
            "seeds": seeds,
            "new_dim": new_dim,
            "new_sitemaps": new_sitemaps,
            "fetched_hosts": fetched_hosts,
            "fetched_sitemaps": fetched_sitemaps,
            "first": self.ROBOTS_DIM not in parent_tables,
            "dim_rows_delta": dim_rows_delta,
            "caches": caches,
            "counters": {
                "n_robots_fetched": n_robots_fetched,
                "n_sitemaps_discovered": n_sitemaps_discovered,
                "n_sitemap_seeds": n_sitemap_seeds,
            },
        }

    def _discovery_finish(self, disc: dict, claimed: DataFrame) -> None:
        """Post-claim discovery step: every host this round claimed from
        that is in neither the dim table nor the queue joins the robots
        worklist (O(distinct claimed hosts) — the claim set is politeness-
        bounded). Mutates ``disc`` in place with the final table contents
        and O(delta) commit sentinels."""
        from ..functions import robots as rb
        from ..sources.checkpoint import UNCHANGED, Patch

        known = disc["dim"].select("host").unionByName(
            disc["rqueue"].select("host")
        )
        new_targets = rb.robots_fetch_targets(claimed, known).cache()
        disc["caches"].append(new_targets)
        disc["counters"]["n_robots_queued"] = new_targets.count()
        disc["rqueue"] = disc["rqueue"].unionByName(new_targets)

        tables = {
            self.ROBOTS_DIM: disc["dim"],
            self.ROBOTS_QUEUE: disc["rqueue"],
            self.SITEMAP_QUEUE: disc["squeue"],
        }
        deltas: dict = {}
        if not disc["first"]:
            # O(delta) merge-on-read upsert layers (r08; previously
            # bucket-granular Appends): a round's uniformly-hashed new
            # hosts touch most buckets, so the Append path re-read and
            # rewrote nearly the whole dim/queue tables every discovery
            # round (~6 jobs each); a layer writes only the delta rows +
            # tombstones. Row totals ride inexact until the chain folds
            # (rows_delta is unknowable here: a re-fetched host is a
            # replacement, not an insert) — nothing consumes these
            # totals beyond display, and folds restore exactness.
            if disc["new_dim"] is not None:
                deltas[self.ROBOTS_DIM] = Patch(
                    disc["new_dim"],
                    upsert=True,
                    rows_delta=disc["dim_rows_delta"],
                )
            else:
                deltas[self.ROBOTS_DIM] = UNCHANGED
            if disc["counters"]["n_robots_queued"] or disc["fetched_hosts"] is not None:
                deltas[self.ROBOTS_QUEUE] = Patch(
                    new_targets,
                    remove_keys=disc["fetched_hosts"],
                    upsert=True,
                )
            else:
                deltas[self.ROBOTS_QUEUE] = UNCHANGED
            if disc["new_sitemaps"] is not None or disc["fetched_sitemaps"] is not None:
                deltas[self.SITEMAP_QUEUE] = Patch(
                    disc["new_sitemaps"]
                    if disc["new_sitemaps"] is not None
                    else disc["squeue"].limit(0),
                    remove_keys=disc["fetched_sitemaps"],
                    upsert=True,
                )
            else:
                deltas[self.SITEMAP_QUEUE] = UNCHANGED
        disc["tables"], disc["deltas"] = tables, deltas

    def run_round(
        self,
        pages: DataFrame,
        *,
        round_epoch: int,
        robots: DataFrame | None = None,
        extra_counters: dict | None = None,
        robots_fetched: DataFrame | None = None,
        sitemap_fetched: DataFrame | None = None,
    ) -> DataFrame:
        """One crawl round: returns the claimed (scheduled) URL set and
        commits S_{k+1} = (seen − expired) ∪ claimed + updated filter.
        ``extra_counters`` ride into the manifest (e.g. the streaming
        driver's batch id for exactly-once replay skipping).

        ``robots_fetched`` (host, robots_txt) and ``sitemap_fetched``
        (sitemap_url, host, xml) are the caller's fetch results for the
        previous round's worklists (``discovery=True`` only — see the
        class docstring); ingestion happens BEFORE this round's claim,
        so a robots body parsed this round governs this round's
        politeness and a leaf sitemap's urls are claimable this round."""
        spark, store = self.spark, self.store
        snap = store.latest_snapshot_id()
        parent_manifest = store.read_manifest(snap)
        counters = parent_manifest["counters"]
        n_seen, capacity = counters["n_seen"], counters["crawl_capacity"]
        params = counters.get("urlseen_params")
        seen_urls = store.read(spark, "seen_urls")
        flt = store.read(spark, urlseen.FILTER_TABLE) if params is not None else None
        corpus_params = counters.get("corpus_params")
        corpus_capacity = counters.get("corpus_capacity", 0)
        corpus_flt = (
            store.read(spark, self.CORPUS_FILTER)
            if corpus_params is not None
            else None
        )

        disc = None
        if self.discovery:
            disc = self._discovery_ingest(
                parent_manifest, robots_fetched, sitemap_fetched, round_epoch
            )
            if robots is None and disc["dim_nonempty"]:
                robots = disc["dim"]
        elif robots_fetched is not None or sitemap_fetched is not None:
            raise ValueError(
                "robots_fetched/sitemap_fetched need CrawlEngine(discovery=True)"
            )

        # TTL expiry: urls seen ≥ ttl_rounds rounds ago become claimable
        # again. The exact set drops them; the cuckoo filter deletes them
        # incrementally (O(expired)); a bloom cannot forget, so any expiry
        # forces its rebuild from the remaining exact set.
        n_expired, expired_keys, expired_df, flt_cached = 0, None, None, None
        claimed, changed_flt, curated = None, None, None
        curate_caches, changed_corpus_flt = [], None
        expand_caches: list = []
        # every cached df is released in the finally even when the commit
        # aborts (e.g. a failed written-count read) — a long-lived engine
        # retrying rounds must not accumulate pinned filter/claim copies
        try:
            if self.ttl_rounds is not None and n_seen:
                cutoff = round_epoch - self.ttl_rounds
                expired = seen_urls.filter(
                    F.col("seen_epoch") <= F.lit(cutoff)
                ).cache()
                n_expired = expired.count()
                if n_expired:
                    expired_df = expired
                    expired_keys = expired.select("canon_url")
                    seen_urls = seen_urls.filter(F.col("seen_epoch") > F.lit(cutoff))
                    n_seen -= n_expired
                    if params is not None and params.get("kind") == "cuckoo":
                        # cache: this lazy delete chain is otherwise
                        # executed twice — once under the probe, once
                        # under the commit
                        flt = urlseen.delete_from_cuckoo(
                            flt,
                            urlseen.hash_urls(expired_keys),
                            n_buckets=params["n_buckets"],
                            n_rows=params["n_rows"],
                        ).cache()
                        flt_cached = flt
                    else:
                        params, flt = None, None  # bloom: rebuild below
                else:
                    expired.unpersist()

            expand_kw = dict(
                seed=self.seed + round_epoch,
                default_budget=self.default_budget,
                follow_links=self.follow_links,
                extra_candidates=disc["seeds"] if disc is not None else None,
                round_caches=expand_caches,
            )
            if params is not None:
                claimed = expand_frontier(
                    pages, robots, seen_filter=(flt, params), **expand_kw
                )
            else:
                claimed = expand_frontier(
                    pages,
                    robots,
                    seen_urls=seen_urls if n_seen else None,
                    **expand_kw,
                )
            claimed = claimed.cache()
            n_curated = 0
            if self.curate:
                curated, curate_caches = self._curate_pages(
                    pages,
                    round_epoch,
                    parent_manifest["tables"],
                    corpus_filter=(
                        (corpus_flt, corpus_params)
                        if corpus_params is not None
                        and counters.get("n_corpus_total", 0)
                        >= self.curate_filter_min_corpus
                        else None
                    ),
                )
                curated = curated.cache()
                # the claim pipeline (canon → dedup → seen probe → claim)
                # and the curation pipeline (extract → gates → dedup) are
                # independent jobs over the same input; materialize them
                # CONCURRENTLY so the curation stages back-fill the claim
                # job's straggler tail (guide §2.6) instead of running
                # strictly after it (r08)
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=2) as ex:
                    f_claimed = ex.submit(claimed.count)
                    f_curated = ex.submit(curated.count)
                    n_claimed, n_curated = f_claimed.result(), f_curated.result()
            else:
                n_claimed = claimed.count()
            if disc is not None:
                self._discovery_finish(disc, claimed)
            new_seen = claimed.select(
                "canon_url", F.lit(round_epoch).cast("long").alias("seen_epoch")
            )
            total = n_seen + n_claimed

            # Append-delta commits (both tables): the seen-set is
            # parent − expired + claimed by construction, and the filter's
            # untouched buckets are bit-identical to the parent's (cuckoo
            # passthrough / bloom OR over disjoint buckets), so the store
            # rewrites ONLY touched buckets by reading their parent dirs —
            # round commit cost is O(claims + expirations + touched
            # buckets), independent of total crawl size.
            from ..sources.checkpoint import UNCHANGED, Append, Patch

            # seen_urls as a merge-on-read UPSERT layer (r08): the Append
            # form re-read and rewrote every touched bucket, and a round's
            # uniformly-hashed claims touch ALL buckets — an O(seen-set)
            # rewrite per round (~2-3 s at the 4M-row bench, the whole
            # table's bytes at 10^10). The layer writes O(claims) rows;
            # claimed ∩ seen = ∅ (the probe has no false negatives) and
            # expired ⊆ seen, so rows_delta is exact and the chain folds
            # at the store's layers bound (amortized O(1) per round).
            deltas: dict = {
                "seen_urls": Patch(
                    new_seen,
                    remove_keys=expired_keys,
                    upsert=True,
                    rows_delta=n_claimed - n_expired,
                )
            }
            if params is None or total > capacity:
                # (re)build at 2× headroom from the EXACT set — the filter
                # is an accelerator, the parquet seen_urls table is the
                # truth. Param/size changes invalidate every bucket →
                # full rewrite.
                capacity = max(2 * total, 1024)
                all_seen = seen_urls.unionByName(new_seen).select("canon_url")
                flt, params = self._build_filter(all_seen, capacity)
            else:
                changed_flt = self._filter_delta_rows(
                    flt,
                    new_seen.select("canon_url"),
                    expired_keys if flt_cached is not None else None,
                    params,
                ).cache()
                flt = changed_flt  # schema-only in the tables dict
                deltas[urlseen.FILTER_TABLE] = Append(
                    changed_flt, remove_keys=Append.SAME
                )
            if disc is not None:
                deltas.update(disc["deltas"])

            curate_tables: dict = {}
            if self.curate:
                # O(new docs) Append keyed on fingerprint; first curate
                # round writes the table outright (no delta entry)
                curate_tables[self.CORPUS] = self.corpus(spark).unionByName(
                    curated
                )
                if self.CORPUS in parent_manifest["tables"]:
                    # merge-on-read upsert layer (r08, same move as
                    # seen_urls): the Append form re-read + rewrote every
                    # touched corpus bucket — O(corpus) once fingerprints
                    # touch all buckets — while the layer writes O(new
                    # docs). curated is disjoint from the corpus (the
                    # round deduped against it) and unique per
                    # fingerprint (window-deduped), so rows_delta is
                    # exact; reads (corpus()/read_buckets confirm path)
                    # reconstruct through layers, folding at the bound.
                    deltas[self.CORPUS] = Patch(
                        curated, upsert=True, rows_delta=n_curated
                    )
                # corpus-filter maintenance mirrors the url seen-filter:
                # (re)build at 2× headroom from the exact corpus when
                # missing/outgrown (the parquet table is the truth),
                # else OR/insert only this round's fingerprints into the
                # touched buckets — an O(new docs) Append
                total_corpus = counters.get("n_corpus_total", 0) + n_curated
                if corpus_params is None or total_corpus > corpus_capacity:
                    corpus_capacity = max(2 * total_corpus, 1024)
                    corpus_flt, corpus_params = self._build_filter(
                        curate_tables[self.CORPUS].select("fingerprint"),
                        corpus_capacity,
                        key_col="fingerprint",
                    )
                    curate_tables[self.CORPUS_FILTER] = corpus_flt
                elif n_curated:
                    changed_corpus_flt = self._filter_delta_rows(
                        corpus_flt,
                        curated.select("fingerprint"),
                        None,
                        corpus_params,
                        key_col="fingerprint",
                    ).cache()
                    curate_tables[self.CORPUS_FILTER] = changed_corpus_flt
                    deltas[self.CORPUS_FILTER] = Append(
                        changed_corpus_flt, remove_keys=Append.SAME
                    )
                else:
                    curate_tables[self.CORPUS_FILTER] = corpus_flt
                    deltas[self.CORPUS_FILTER] = UNCHANGED

            store.commit(
                {
                    "seen_urls": seen_urls.unionByName(new_seen),
                    urlseen.FILTER_TABLE: flt,
                    **(disc["tables"] if disc is not None else {}),
                    **curate_tables,
                },
                seed=self.seed,
                round_epoch=round_epoch,
                counters={
                    "n_seen": total,
                    "n_claimed": n_claimed,
                    "n_expired": n_expired,
                    "crawl_capacity": capacity,
                    "urlseen_params": params,
                    **(
                        {
                            "n_curated": n_curated,
                            "n_corpus_total": counters.get("n_corpus_total", 0)
                            + n_curated,
                            "corpus_params": corpus_params,
                            "corpus_capacity": corpus_capacity,
                        }
                        if self.curate
                        # a curate=False round over a curate store must
                        # not erase the corpus bookkeeping: since r07 the
                        # TABLES carry forward automatically, but counters
                        # are writer-composed — dropping corpus_params
                        # here would reset n_corpus_total to 0 and force
                        # a full filter rebuild + exact anti-join on the
                        # next curate round (same class as ADVICE r06 #1)
                        # (n_curated is per-round and intentionally absent)
                        else {
                            k: counters[k]
                            for k in (
                                "n_corpus_total",
                                "corpus_params",
                                "corpus_capacity",
                            )
                            if k in counters
                        }
                    ),
                    **(disc["counters"] if disc is not None else {}),
                    # the streaming driver's exactly-once replay skip
                    # reads stream_batch_id from the LATEST manifest —
                    # a non-stream round interleaved between commits
                    # must not erase it (ADVICE r04), so it carries
                    # forward unless this round overrides it
                    **(
                        {"stream_batch_id": counters["stream_batch_id"]}
                        if "stream_batch_id" in counters
                        else {}
                    ),
                    **(extra_counters or {}),
                },
                deltas=deltas,
            )
            if total > self.rows_per_bucket * store.n_partitions:
                new_parts = store.n_partitions
                while total > self.rows_per_bucket * new_parts:
                    new_parts *= 2
                store.compact(
                    self.spark,
                    seed=self.seed,
                    round_epoch=round_epoch,
                    n_partitions=new_parts,
                )
            return claimed
        finally:
            disc_caches = disc["caches"] if disc is not None else []
            for cached in (
                expired_df, flt_cached, changed_flt, claimed, curated,
                *curate_caches, changed_corpus_flt, *disc_caches,
                *expand_caches,
            ):
                if cached is not None:
                    cached.unpersist()


@dataclass
class RoundResult:
    snapshot_id: int
    n_claims: int
    n_completed: int
    n_reaped: int
    stats: dict[str, Any] = field(default_factory=dict)


class RoundEngine:
    """Drives frontier snapshots through scheduling rounds (E1+E2+E3)."""

    #: the frontier columns transitions can mutate (U1-U8 + apply_claims);
    #: everything else — number, url, host, priority, shard bounds — is
    #: immutable after seed load, which is what makes the column-granular
    #: Patch commit exact: a layer's (key, state-vector) fully describes
    #: the round's effect on a row.
    FRONTIER_STATE_COLS = (
        "pending",
        "closed",
        "gpu",
        "gpu_url",
        "completor",
        "cpu_completor",
        "claim_epoch",
    )

    #: the open-set sidecar (r05, VERDICT r04 missing #1): a row per OPEN
    #: frontier job (~pending & ~closed) carrying exactly what the claim
    #: ranking needs. The politeness rank is semantically over the open
    #: set only — the reference's Postgres serves it via the partial
    #: index behind `pending=false AND closed=false`
    #: (/root/reference/models.py:108-112); this table is that index's
    #: Spark analogue, maintained O(touched) per round by an upsert
    #: Patch layer, so the per-round claim scan reads O(open), not
    #: O(frontier) — the last O(frontier) pass per round is gone.
    OPEN_SIDECAR = "open_frontier"

    #: sidecar columns: number is the key; host/priority feed the
    #: politeness rank (immutable after seed load); gpu splits the
    #: cpu/gpu claim stages (mutable — a CPU completion promotes the
    #: row); host_key (r07) is the persisted rank/bucket key — the
    #: sidecar table is physically BUCKETED on it (store bucket layout),
    #: which is what lets the per-round politeness rank read the open
    #: set with zero Exchange (VERDICT r06 next #1)
    SIDECAR_COLS = ("number", "host", "priority", "gpu", "host_key")

    def __init__(
        self,
        spark: SparkSession,
        store: CheckpointStore,
        *,
        seed: int = 42,
        host_default_budget: int = 4,
    ):
        self.spark = spark
        self.store = store
        self.seed = seed
        self.host_default_budget = host_default_budget

    @staticmethod
    def _with_host_key(df: DataFrame) -> DataFrame:
        """Ensure the stored rank key column (host_key = seeded_hash64
        of the host string, the claim operator's precondition)."""
        if "host_key" in df.columns:
            return df
        return df.withColumn("host_key", seeded_hash64(F.col("host")))

    def bootstrap(
        self,
        frontier: DataFrame,
        workers: DataFrame,
        leaderboard: DataFrame | None = None,
        cpu_leaderboard: DataFrame | None = None,
        *,
        round_epoch: int = 0,
        open_sidecar: bool = True,
        bucketed_sidecar: bool = True,
    ) -> int:
        from .. import schemas

        # persist the numeric rank key on the frontier (and thus the
        # sidecar): a STORED host_key is what a host-bucketed layout can
        # cluster on, and claim_batch ranks over it without recomputing
        # (a freshly-computed hash can never be plan-equated with the
        # bucketing column)
        frontier = self._with_host_key(frontier)
        if open_sidecar and bucketed_sidecar:
            self.store.set_bucket_layout(self.OPEN_SIDECAR, "host_key")
        lb = leaderboard
        if lb is None:
            lb = self.spark.createDataFrame([], schema=schemas.LEADERBOARD)
        cpu_lb = cpu_leaderboard
        if cpu_lb is None:
            cpu_lb = self.spark.createDataFrame([], schema=schemas.CPU_LEADERBOARD)
        # seed the manifest with the dashboard stats so every subsequent
        # round can maintain them INCREMENTALLY (counts drift by the
        # touched-row deltas) instead of re-scanning the whole frontier —
        # the bootstrap is a full write anyway, so one narrow aggregate
        # here is its honest cost
        stats = agg.frontier_stats(frontier).collect()[0].asDict()
        tables = {
            "frontier": frontier,
            "workers": workers,
            "leaderboard": lb,
            "cpu_leaderboard": cpu_lb,
        }
        if open_sidecar:
            tables[self.OPEN_SIDECAR] = frontier.filter(
                ~F.col("pending") & ~F.col("closed")
            ).select(*self.SIDECAR_COLS)
        return self.store.commit(
            tables,
            seed=self.seed,
            round_epoch=round_epoch,
            counters=stats,
        )

    def run_round(
        self,
        *,
        round_epoch: int,
        completions: DataFrame | None = None,
        heartbeats: DataFrame | None = None,
        robots: DataFrame | None = None,
        stage: str = "cpu",
        worker_type: str = "CPU",
        frontier_commit: str = "patch",
    ) -> RoundResult:
        """One deterministic round: S_k → S_{k+1}.

        Order mirrors the per-request server: completions first
        (main.py:627-697), then reaper (main.py:748-759), then claims
        (main.py:533-598), then leaderboard/stats (E3).

        ``frontier_commit`` (r04, VERDICT r03 item #3). The first two
        modes recompute the round's updated frontier ROWS from a
        point-read of just the touched buckets (store.read_buckets + the
        same transition chain) — the commit never re-executes the
        transition plan over the whole frontier — and maintain the
        dashboard stats incrementally from the touched-row before/after
        deltas. When the store carries the :attr:`OPEN_SIDECAR` table
        (default since r05) they also CLAIM from it instead of scanning
        the frontier: the politeness rank reads O(open set) rows — at
        10^10 urls with 1% open, 100× less than the table — closing the
        last O(frontier) pass per round (VERDICT r04 missing #1); claim
        output is pytest-asserted identical to the full-scan path. The
        modes differ in how the updated rows are committed:
          - ``"patch"`` (default): merge-on-read layer (checkpoint.Patch)
            — the commit WRITES only the updated rows, so beyond the
            (semantically required, narrow-projection) claim scan the
            round's commit cost is O(transitions), independent of
            frontier size. Bucket-granular deltas cannot deliver that: a
            uniformly-hashed 100k-key batch touches every bucket of any
            realistically-sized store, so "rewrite only touched buckets"
            degenerates to a full rewrite. Layer chains fold at the
            store's patch_layers_max (amortized O(1)).
          - ``"append"``: bucket-granular checkpoint.Append — rewrites
            every touched bucket from the parent's dirs. Right shape when
            rounds touch FEW buckets (small batches / clustered keys);
            kept for that regime and as a second equivalence oracle.
          - ``"rewrite"``: the pre-r04 key-delta path (full transition
            plan executed, changed buckets filtered out of it) — the
            equivalence oracle (tests assert all paths commit identical
            state).
        """
        if frontier_commit not in ("patch", "append", "rewrite"):
            raise ValueError(
                f"frontier_commit must be patch|append|rewrite: {frontier_commit}"
            )
        spark, seed = self.spark, self.seed
        parent_manifest = self.store.read_manifest(self.store.latest_snapshot_id())
        parent_counters = parent_manifest["counters"]
        # open-set-pruned claim scan (r05): when the sidecar exists, the
        # claim ranks over it — O(open) — instead of scanning the whole
        # frontier; the rewrite mode keeps the full-scan path as the
        # equivalence oracle (the 3-mode test proves identical claims)
        sidecar_in_parent = self.OPEN_SIDECAR in parent_manifest["tables"]
        use_sidecar = sidecar_in_parent and frontier_commit in ("patch", "append")
        frontier = self.store.read(spark, "frontier")
        workers = self.store.read(spark, "workers")
        leaderboard = self.store.read(spark, "leaderboard")
        cpu_leaderboard = self.store.read(spark, "cpu_leaderboard")

        n_completed = 0
        if completions is not None:
            completions = completions.cache()
            n_completed = completions.count()
            frontier = tr.complete_jobs(frontier, completions)
            # HYBRID/GPU completions feed the main leaderboard
            # (main.py:687-694); CPU-stage ones feed CPU_Leaderboard
            # (main.py:661-667) — jobs only, no pairs.
            leaderboard = agg.leaderboard_merge(leaderboard, completions)
            cpu_leaderboard = agg.leaderboard_merge(
                cpu_leaderboard.withColumn("pairs_scraped", F.lit(0).cast("long")),
                completions,
                kind_filter=("cpu",),
            ).drop("pairs_scraped")
            workers = agg.worker_counters_merge(workers, completions)
        if heartbeats is not None:
            workers = tr.heartbeat(workers, heartbeats)

        n_before = workers.count()
        # shards the reaper may release — part of the frontier delta below
        reaped_shards = (
            workers.filter(
                F.col("last_seen") <= F.lit(round_epoch - tr.IDLE_TIMEOUT_S)
            )
            .filter(F.col("shard_number").isNotNull())
            .select(F.col("shard_number").alias("number"))
        )
        frontier, workers = tr.reap_idle(frontier, workers, round_epoch)
        workers = workers.cache()
        n_reaped = n_before - workers.count()

        open_now = None
        claim_parts = None
        if use_sidecar and completions is None and n_reaped == 0:
            # nothing re-opened or promoted this round — the parent
            # sidecar IS the post-transition open set; skip the splice.
            # read_parts (r07): [bucketed base − patched keys, layer
            # survivors] — the big part ranks with ZERO Exchange over the
            # host_key-bucketed layout; only O(touched ∪ winners) rows
            # ever meet a shuffle.
            open_now = self.store.read(spark, self.OPEN_SIDECAR)
            claim_parts = self.store.read_parts(spark, self.OPEN_SIDECAR)
        elif use_sidecar:
            # The round's pre-claim transitions (completions, reaper) can
            # RE-OPEN or promote rows that must be claimable this same
            # round (server order: completions before claims). Their key
            # set is O(delta), so: point-read just those keys, re-apply
            # the same transitions, and splice the result into the
            # sidecar — the claim then ranks over (sidecar − touched) ∪
            # (touched rows still open), exactly the open set of the
            # post-transition frontier, without ever scanning it.
            pre_touched = reaped_shards
            if completions is not None:
                pre_touched = pre_touched.unionByName(completions.select("number"))
            pre_touched = pre_touched.dropDuplicates(["number"])
            pre_rows = self.store.read_buckets(
                spark,
                "frontier",
                pre_touched,
                columns=(
                    "number", "host", "priority", "host_key",
                    *self.FRONTIER_STATE_COLS,
                ),
            ).join(F.broadcast(pre_touched), on="number", how="left_semi")
            if completions is not None:
                pre_rows = tr.complete_jobs(pre_rows, completions)
            pre_rows = tr.release_claims(pre_rows, reaped_shards)
            pre_open = pre_rows.filter(
                ~F.col("pending") & ~F.col("closed")
            ).select(*self.SIDECAR_COLS)
            open_now = self.store.read(spark, self.OPEN_SIDECAR)
            # decomposed claim input: subtract the touched keys from
            # EVERY store part (broadcast anti-joins — partitioning-
            # preserving on the bucketed base) and add the re-opened
            # rows as one more tiny part; claim_batch_union re-ranks
            # only the pre-ranked survivors.
            claim_parts = [
                part.join(F.broadcast(pre_touched), on="number", how="left_anti")
                for part in self.store.read_parts(spark, self.OPEN_SIDECAR)
            ] + [pre_open]
        else:
            claim_input = frontier

        if claim_parts is not None:
            # all sidecar rows are open by construction; the literal
            # flags satisfy claim_batch's open_jobs filter (constant-
            # folded by Catalyst) without widening the sidecar schema
            claim_parts = [
                p.withColumn("pending", F.lit(False)).withColumn(
                    "closed", F.lit(False)
                )
                for p in claim_parts
            ]
            claims = claim_op.claim_batch_union(
                claim_parts,
                robots,
                seed=seed + round_epoch,  # fresh deterministic order each round
                stage=stage,
                default_budget=self.host_default_budget,
            )
        else:
            claims = claim_op.claim_batch(
                claim_input,
                robots,
                seed=seed + round_epoch,
                stage=stage,
                default_budget=self.host_default_budget,
                with_payload=True,
            )
        claims = claim_op.assign_workers(claims, workers, worker_type=worker_type, seed=seed)
        claims = claims.cache()
        n_claims = claims.count()
        frontier = claim_op.apply_claims(frontier, claims, round_epoch=round_epoch)

        touched = claims.select("number").unionByName(reaped_shards)
        if completions is not None:
            touched = touched.unionByName(completions.select("number"))
        touched = touched.dropDuplicates(["number"])

        sub_before = sub_after = rewrite_cached = None
        if frontier_commit in ("patch", "append"):
            # Point-read the touched buckets, restrict to the touched
            # keys, and re-apply the SAME per-key transition chain — the
            # merges only alter rows matching their delta keys, so the
            # subset transform equals the full-plan transform restricted
            # to those keys (pytest-asserted vs the rewrite path).
            # Patch mode is COLUMN-granular (r04): transitions only ever
            # touch the mutable state columns, so the point-read prunes
            # to (number + state) at the parquet scan — the immutable
            # url/host payload never rides the commit path — and the
            # layer write carries only those columns.
            from ..sources.checkpoint import Append, Patch

            # patch mode prunes the point-read to key + state columns —
            # host/priority ride along only when the sidecar needs them
            # for open_after (still narrow; the wide url payload never
            # rides the commit path either way)
            narrow = (
                (
                    (
                        "number", "host", "priority", "host_key",
                        *self.FRONTIER_STATE_COLS,
                    )
                    if use_sidecar
                    else ("number", *self.FRONTIER_STATE_COLS)
                )
                if frontier_commit == "patch"
                else None
            )
            # claims-only rounds (no completions/heartbeats/reaping — the
            # steady scheduling regime) change exactly n_claims rows from
            # open(stage) to pending, so the stats delta is arithmetic:
            # no before/after scan jobs at all (r08). Any other round
            # keeps the generic scanned delta.
            claims_only = (
                completions is None and heartbeats is None and n_reaped == 0
            )
            arithmetic_stats = claims_only and all(
                k in parent_counters for k in self._STATS_COUNT_KEYS
            )
            sub_before = (
                self.store.read_buckets(spark, "frontier", touched, columns=narrow)
                .join(F.broadcast(touched), on="number", how="left_semi")
            )
            if not arithmetic_stats:
                # generic path: sub_before feeds both the stats scan and
                # sub_after — cache it; arithmetic rounds have a single
                # consumer chain, so caching would only add a store pass
                sub_before = sub_before.cache()
            sub_after = sub_before
            if completions is not None:
                sub_after = tr.complete_jobs(sub_after, completions)
            sub_after = tr.release_claims(sub_after, reaped_shards)
            sub_after = claim_op.apply_claims(
                sub_after, claims, round_epoch=round_epoch
            ).cache()
            # mode switching (r05): Append is bucket-granular and cannot
            # see live merge-on-read layers — an append round following
            # patch rounds FOLDS the frontier instead (full rewrite from
            # the post-transition plan, layers cleared), same shape the
            # chain-at-max fold takes
            frontier_layers = bool(
                parent_manifest["tables"]["frontier"].get("delta_layers")
            )
            deltas: dict = {}
            if frontier_commit == "patch":
                deltas["frontier"] = Patch(
                    sub_after, columns=self.FRONTIER_STATE_COLS
                )
            elif not frontier_layers:
                deltas["frontier"] = Append(sub_after, remove_keys=Append.SAME)
            if arithmetic_stats:
                stats_row = self._claims_only_stats(
                    parent_counters, n_claims, stage
                )
            else:
                stats_row = self._incremental_stats(
                    parent_counters, sub_before, sub_after, frontier
                )
        else:
            # key-delta rewrite of changed buckets — unless live layers
            # force a full rewrite (which also clears them)
            deltas = (
                {}
                if parent_manifest["tables"]["frontier"].get("delta_layers")
                else {"frontier": touched}
            )
            # NOTE (r08): caching the post-transition frontier here (so
            # the stats scan + frontier write + sidecar write share one
            # materialization) was tried and measured 3-4x SLOWER at 16M
            # rows: building the in-memory columnar cache of wide string
            # rows costs far more than the recompute it saves (a parquet
            # scan + small broadcast joins) — guide §5's caching caveat.
            # The claims-only arithmetic stats shortcut applies equally
            # to this mode (r08): it removes the one O(frontier) pass
            # that is NOT semantically forced by the rewrite commit.
            if (
                completions is None
                and heartbeats is None
                and n_reaped == 0
                and all(k in parent_counters for k in self._STATS_COUNT_KEYS)
            ):
                stats_row = self._claims_only_stats(
                    parent_counters, n_claims, stage
                )
            else:
                stats_row = agg.frontier_stats(frontier).collect()[0].asDict()
        tables = {
            "frontier": frontier,
            "workers": workers,
            "leaderboard": leaderboard,
            "cpu_leaderboard": cpu_leaderboard,
        }
        # small-table commit hygiene: the leaderboards only change on
        # completions, and workers only on completions/heartbeats/
        # reaping — when a round provably left them untouched, inherit
        # the parent's buckets instead of rewriting + recounting them
        # (each skipped table saves a write job + a count-back job)
        from ..sources.checkpoint import UNCHANGED

        if completions is None:
            deltas["leaderboard"] = UNCHANGED
            deltas["cpu_leaderboard"] = UNCHANGED
            if heartbeats is None and n_reaped == 0:
                deltas["workers"] = UNCHANGED
        if use_sidecar:
            # sidecar maintenance is the same O(touched) upsert layer:
            # touched keys tombstone out, still-open touched rows
            # re-enter (the layer's df beats its tombstones per key).
            # rows_delta comes from the EXACT incremental stats (open =
            # open_cpu + open_gpu), keeping the manifest row count exact.
            # The fold plan reconstructs from the parent's sidecar read —
            # O(open) — never from the O(frontier) full plan.
            open_after = sub_after.filter(
                ~F.col("pending") & ~F.col("closed")
            ).select(*self.SIDECAR_COLS)
            parent_sc = parent_manifest["tables"][self.OPEN_SIDECAR]
            rows_delta = None
            if parent_sc.get("total_rows_exact", True):
                rows_delta = (
                    stats_row["open_cpu_jobs"]
                    + stats_row["open_gpu_jobs"]
                    - parent_sc["total_rows"]
                )
            deltas[self.OPEN_SIDECAR] = Patch(
                open_after,
                remove_keys=touched,
                upsert=True,
                rows_delta=rows_delta,
            )
            tables[self.OPEN_SIDECAR] = (
                open_now.join(F.broadcast(touched), on="number", how="left_anti")
                .unionByName(open_after)
                .select(*self.SIDECAR_COLS)
            )
        elif sidecar_in_parent:
            # rewrite mode keeps the sidecar table alive with a full
            # rewrite from the post-transition frontier plan (this mode
            # is the O(frontier) equivalence oracle anyway)
            tables[self.OPEN_SIDECAR] = frontier.filter(
                ~F.col("pending") & ~F.col("closed")
            ).select(*self.SIDECAR_COLS)
        snap = self.store.commit(
            tables,
            seed=seed,
            round_epoch=round_epoch,
            counters={
                "n_claims": n_claims,
                "n_completed": n_completed,
                "n_reaped": n_reaped,
                **stats_row,
            },
            deltas=deltas,
        )
        claims.unpersist()
        workers.unpersist()
        for cached in (sub_before, sub_after, rewrite_cached):
            if cached is not None:
                cached.unpersist()
        if completions is not None:
            completions.unpersist()
        return RoundResult(snap, n_claims, n_completed, n_reaped, stats_row)

    _STATS_COUNT_KEYS = (
        "total_jobs",
        "completed_jobs",
        "open_cpu_jobs",
        "open_gpu_jobs",
        "pending_jobs",
    )

    def _claims_only_stats(
        self, parent_counters: dict, n_claims: int, stage: str
    ) -> dict:
        """Stats delta of a claims-only round, arithmetically (r08): the
        round's only transition is apply_claims, which flips exactly the
        n_claims claimed rows — all open in ``stage``'s gpu class by the
        open_jobs filter — to pending. Exact; no scan jobs. Rounds with
        completions/heartbeats/reaping use :meth:`_incremental_stats`."""
        out = {k: parent_counters[k] for k in self._STATS_COUNT_KEYS}
        out["open_gpu_jobs" if stage == "gpu" else "open_cpu_jobs"] -= n_claims
        out["pending_jobs"] += n_claims
        out["completion_pct"] = (
            out["completed_jobs"] * 100.0 / out["total_jobs"]
            if out["total_jobs"] > 0
            else 100.0
        )
        return out

    def _incremental_stats(
        self,
        parent_counters: dict,
        sub_before: DataFrame,
        sub_after: DataFrame,
        frontier: DataFrame,
    ) -> dict:
        """Dashboard stats without the full-frontier scan: parent counts
        drift by (touched rows after − before). Exact — transitions never
        add or remove frontier rows, so every count change is confined to
        the touched subset. Falls back to one full aggregate when the
        parent manifest predates stats-carrying or was compacted from an
        older layout."""
        if not all(k in parent_counters for k in self._STATS_COUNT_KEYS):
            return agg.frontier_stats(frontier).collect()[0].asDict()
        before = agg.frontier_stats(sub_before).collect()[0].asDict()
        after = agg.frontier_stats(sub_after).collect()[0].asDict()
        out = {
            k: parent_counters[k] + after[k] - before[k]
            for k in self._STATS_COUNT_KEYS
        }
        out["completion_pct"] = (
            out["completed_jobs"] * 100.0 / out["total_jobs"]
            if out["total_jobs"] > 0
            else 100.0
        )
        return out
