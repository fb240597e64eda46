"""The crawl engine: BFS URL-frontier as iterative DataFrame programs.

Implements CRAWL CONTRACT v3 (golden.py) Spark-first (SURVEY.md §3.2):
request identity is the (verb, url, post_data) triple — method=post forms
become POST requests crawled independently of their GET twins.

    seeds -> frontier(wave 0)
    per wave:
      1. budgets   = robots crawl-delay -> per-netloc budget (join, broadcast
                     when small)
      2. elect     = two-phase salted top-budget per netloc window (W1/W2/J5:
                     phase 1 ranks within (netloc, salt) so one skew host
                     cannot pin a single reducer; phase 2 ranks the <= B*salts
                     survivors per netloc — provably equal to the unsalted
                     global per-host top-B)
      3. fetch     = elected left-join latest pages on url (J1)
      4. parse     = ONE vectorized mapInPandas pass (C6) emitting outlinks +
                     text + title + meta + comments + a status column (fetch
                     misses pass through as 404 rows, so the html-carrying
                     join output is never cached); the only place html is
                     ever read (column pruning, SURVEY.md §4)
      5. checkers  = DataFrame builders over parsed (C2..C5, C7), all JVM
                     checkers + the spelling token explode fused into one
                     scan of the parsed cache
      6. cand      = explode(outlinks) ∪ meta-refresh targets (hop-capped
                     redirect chains) -> ext/domain/depth filters ->
                     groupBy(url).min(struct(depth, referrer, redirects))
      7. new       = bloom-shard probe (cogroup applyInPandas) -> exact
                     anti-join fallback only for bloom-positives (A1/J2)
      8. gate      = robots verdicts on the *new* urls only (R1) — each url
                     is gated exactly once in its lifetime
      9. frontier' = politeness remainder ∪ gated-new;  seen' = seen ∪ new
     10. optional atomic wave checkpoint (S4/R3) -> resume-exactly

Scale notes (10^10-URL frontier): all state is DataFrames — nothing
materializes on the driver. Cross-wave lineage is truncated every wave
(localCheckpoint, or the checkpoint tables themselves when resumable mode is
on) so plans stay O(1) per wave. The seen set is sharded bloom bits probed
via cogroup — the exact anti-join only ever sees bloom-positive candidates
(true dups + ~1% false positives), so the expensive shuffle join shrinks by
~the novelty rate. Shard count and bloom sizing are config knobs sized so
one shard's bits fit comfortably in one task (default 2^17 bits = 16 KiB).
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sitecheck_spark import robots as robots_mod
from sitecheck_spark.checkers import wave_findings_pass
from sitecheck_spark.extract import PARSED_SCHEMA, parse_pages_batch
from sitecheck_spark.functions.urls import canonicalize, netloc_of
from sitecheck_spark.golden import IGNORED_EXTENSIONS
from sitecheck_spark.seen import BloomShard, CuckooShard
from sitecheck_spark.sources import catalog as catalog_mod
from sitecheck_spark.sources.catalog import WaveCatalog


@dataclass
class CrawlConfig:
    budget_per_host: int = 10
    max_waves: int = 50
    max_depth: int = 10
    max_redirects: int = 5             # meta-refresh chain hop cap
    allowed_netlocs: list[str] | None = None  # default: seed netlocs
    n_shards: int = 32
    salt_buckets: int = 8
    use_bloom: bool = True
    filter_kind: str = "bloom"         # 'bloom' | 'cuckoo' (cuckoo: deletable)
    bloom_bits: int = 1 << 17          # per shard; multiple of 8
    bloom_hashes: int = 7
    cuckoo_buckets: int = 1 << 13      # per shard; power of two, 4 slots each
    checkpoint_dir: str | None = None  # enables resumable mode (catalog.py)
    # Resumable mode commits `seen` as per-wave DELTAS (this wave's new
    # requests) with a full compaction snapshot every k waves: per-wave
    # checkpoint I/O is O(new urls) instead of O(|seen|), and resume reads
    # at most k-1 deltas on top of the newest snapshot. At a 10^10-URL
    # frontier the cumulative seen dwarfs any single wave's delta — full
    # per-wave snapshots were the one super-linear-in-waves checkpoint cost.
    seen_compact_every: int = 16
    # Set when `pages` carries catalog.PAGES_BUCKET_COL (write_pages_bucketed
    # layout): the fetch join adds the bucket key so the scan prunes to the
    # partitions holding elected urls (dynamic partition pruning). MUST match
    # the writer's modulus — validated on a sample at crawl start.
    pages_buckets: int | None = None
    # Set when `pages` is a Spark bucketed TABLE (catalog.
    # write_pages_bucketed_table, bucketBy(N, url)): the fetch join and the
    # version-dedup agg reuse the table's bucketing, so html crosses ZERO
    # exchanges per wave — the storage-partitioned-join shape an Iceberg
    # bucket(N, url) table gives. Takes precedence over broadcast_fetch /
    # pages_buckets. Parse parallelism = the table's bucket count.
    pages_prebucketed: bool = False
    run_checkers: bool = True
    verbose: bool = False
    # Attribution mode for the scaling telemetry: force the wave chain's
    # persisted layers in dependency order under DISTINCT callSite labels
    # (wave_elect / wave_fetch_parse / wave_probe_gate) instead of one
    # fused wave_chain job, so N-vs-4N stage tables localize co-scheduling
    # inflation to a sub-phase. Total work is unchanged (elected and parsed
    # are persisted in production mode too); only cross-phase pipelining
    # overlap is lost, so wall time reads slightly higher — keep False
    # outside benchmarking.
    phase_labels: bool = False
    # Broadcast the elected url set into the pages scan (no corpus shuffle).
    # Right whenever one wave's election fits in executor memory. Set False
    # on clusters where budget*hosts exceeds broadcast limits — there the
    # shuffle join is co-located by the pages table's url bucketing anyway.
    broadcast_fetch: bool = True
    # Partitions for the vectorized parse pass. AQE coalesces exchanges by
    # shuffle BYTES, which starves the downstream Python stage of
    # parallelism (a 200 MB wave coalesces to ~4 tasks on a 32-core
    # cluster). None -> max(2 * defaultParallelism,
    # frontier_rows / parse_rows_per_partition): the first term keeps every
    # core busy on small waves, the second caps PARTITION SIZE on big waves
    # — sizing by cores alone hands a small cluster multi-GB partitions
    # (html + parse output) and OOMs its executors; partition count must
    # scale with data, not cluster size.
    parse_partitions: int | None = None
    parse_rows_per_partition: int = 20_000


@dataclass
class CrawlResult:
    fetch_log: DataFrame
    findings: DataFrame
    seen: DataFrame          # (url, url_hash, shard)
    waves: int = 0
    metrics: list[dict] = field(default_factory=list)
    shards: DataFrame | None = None
    _cached: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        """Unpersist every RDD this crawl left cached (final state + wave
        deltas). Call when done with the result — repeated crawls in one
        session otherwise accumulate cached blocks and degrade."""
        for df in self._cached:
            try:
                df.unpersist()
            except Exception:
                pass
        self._cached.clear()


FINDINGS_SCHEMA = "module string, url string, wave int, detail string, referrer string"
_EXT_PATTERN = "(?i)(?:" + "|".join(re.escape(e) for e in IGNORED_EXTENSIONS) + ")$"
_ISIN_MAX_NETLOCS = 64  # above this, the allow-list joins instead of inlining
_WAVE_ROWS_PER_PARTITION = 12_500  # frontier rows per wave-scoped shuffle partition


def latest_pages(pages: DataFrame) -> DataFrame:
    """As-of pick of the newest warc_ts version per url (W3).

    max_by instead of a window: one partial-aggregating shuffle, no sort —
    the right plan when versions-per-url is small and urls are many. The
    tie-break is TOTAL — max over (warc_ts, md5(html)) — so a corpus with
    duplicate (url, warc_ts) rows and differing html still yields a
    deterministic pick (golden.py applies the identical rule).
    """
    return pages.groupBy("url").agg(
        F.max_by("html", F.struct("warc_ts", F.md5("html"))).alias("html")
    )


def robots_from_pages(pages: DataFrame) -> DataFrame:
    """R1: robots.txt bodies live in the corpus itself."""
    return (
        pages.filter(F.col("url").endswith("/robots.txt"))
        .groupBy(F.parse_url("url", F.lit("HOST")).alias("netloc"))
        .agg(F.max_by("text", F.struct("warc_ts", F.md5("text"))).alias("rules"))
    )


_BUDGET_SCHEMA = "netloc string, budget int"


def _budgets_fn(budget_per_host: int):
    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            budgets = []
            for rules in pdf["rules"]:
                d = robots_mod.crawl_delay(rules)
                budgets.append(
                    max(1, math.floor(budget_per_host / d)) if d else budget_per_host
                )
            yield pd.DataFrame({"netloc": pdf["netloc"], "budget": budgets})

    return fn


_RULES_SCHEMA = "netloc string, seq int, prefix string, allow boolean"


def _compile_rules_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Compile robots.txt bodies ONCE into (netloc, seq, prefix, allow) rows.

    Uses urllib.robotparser's own parsed entries so semantics (first matching
    rule in file order wins, empty-Disallow -> allow) are exactly its
    semantics: RuleLine.path is already robotparser-quoted, and the gate
    matches it against robots.match_path(url) — the byte-identical string
    can_fetch itself uses — so the JVM prefix join reproduces robotparser
    verdicts exactly (tests/test_robots.py::test_gate_matches_robotparser).
    """
    for pdf in batches:
        rows = []
        for netloc, rules in zip(pdf["netloc"], pdf["rules"]):
            if rules is None or (isinstance(rules, float) and pd.isna(rules)):
                continue
            try:
                rp = robots_mod._build_parser(rules)
            except Exception:
                continue
            entry = None
            for e in rp.entries:
                if e.applies_to(robots_mod.USER_AGENT):
                    entry = e
                    break
            if entry is None:
                entry = rp.default_entry
            if entry is None:
                continue
            for i, line in enumerate(entry.rulelines):
                rows.append((netloc, i, line.path, bool(line.allowance)))
        yield pd.DataFrame(rows, columns=["netloc", "seq", "prefix", "allow"])


def _robots_gate_fn(passthrough_cols: list[str]):
    """mapInPandas over (…cols…, rules) -> (…cols…, robots_allowed)."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, object] = {}
        for pdf in batches:
            verdicts = []
            for url, netloc, rules in zip(pdf["url"], pdf["netloc"], pdf["rules"]):
                if rules is None or (isinstance(rules, float) and pd.isna(rules)):
                    verdicts.append(True)
                    continue
                if netloc not in cache:
                    try:
                        cache[netloc] = robots_mod._build_parser(rules)
                    except Exception:
                        cache[netloc] = None
                rp = cache[netloc]
                try:
                    verdicts.append(rp.can_fetch(robots_mod.USER_AGENT, url) if rp else True)
                except Exception:
                    verdicts.append(True)
            out = pdf[passthrough_cols].copy()
            out["robots_allowed"] = verdicts
            yield out

    return fn


# --- bloom shard cogroup functions (module-level: must be picklable) -------

def _new_filter(cfg: "CrawlConfig"):
    if cfg.filter_kind == "cuckoo":
        return CuckooShard(cfg.cuckoo_buckets)
    return BloomShard(cfg.bloom_bits, cfg.bloom_hashes)


def _filter_from_bytes(raw: bytes):
    return CuckooShard.from_bytes(raw) if raw[:4] == CuckooShard.HEADER \
        else BloomShard.from_bytes(raw)


_CAND_COLS = ["url", "netloc", "depth", "priority", "referrer", "redirects",
              "verb", "post_data", "url_hash", "shard"]
_FUSED_SCHEMA = (
    "kind int, url string, netloc string, depth int, priority double, "
    "referrer string, redirects int, verb string, post_data string, "
    "url_hash long, shard int, "
    "maybe_seen boolean, bits binary, n_items long, _path string"
)


def _make_probe_merge_fn(cfg: "CrawlConfig"):
    """ONE cogroup per wave doing both bloom probe and bloom update.

    Sound because the seen set grows by exactly this wave's candidate set:
    every candidate is marked seen this wave (enqueued or robots-blocked).
    Probing happens before adding, so same-wave flags are unaffected. Only
    filter-NEGATIVE hashes are inserted: re-adding a positive is a no-op
    for bloom but NOT for cuckoo (duplicate fingerprints eat slots until
    premature saturation — cycle links recur every wave), and skipping a
    false-positive new URL stays exact because probe-positives always fall
    through to the exact anti-join.
    """

    def fn(key, cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(shard_pdf):
            bloom = _filter_from_bytes(bytes(shard_pdf["bits"].iloc[0]))
            n_items = int(shard_pdf["n_items"].iloc[0])
        else:
            bloom = _new_filter(cfg)
            n_items = 0
        parts = []
        if len(cand_pdf):
            hashes = cand_pdf["url_hash"].to_numpy()
            out = cand_pdf[_CAND_COLS].copy()
            maybe_seen = bloom.contains(hashes)
            out["kind"] = 0
            out["maybe_seen"] = maybe_seen
            fresh = hashes[~maybe_seen]
            if isinstance(bloom, CuckooShard):
                bloom.insert(fresh)  # flips to saturated (all-True) on overflow
            else:
                bloom.add(fresh)
            n_items += int(len(fresh))
            out["bits"] = None
            out["n_items"] = 0
            # robots match string computed HERE: the candidate rows already
            # cross the Python boundary for the probe, so the downstream
            # robots gate reuses this column instead of running its own
            # mapInPandas pass (one fewer Arrow round trip per wave).
            out["_path"] = [robots_mod.match_path(u) for u in out["url"]]
            parts.append(out)
        parts.append(
            pd.DataFrame(
                {
                    "url": [""], "netloc": [""], "depth": [0], "priority": [0.0],
                    "referrer": [""], "redirects": [0], "verb": [""],
                    "post_data": [""], "url_hash": [0],
                    "shard": [int(key[0])], "kind": [1], "maybe_seen": [False],
                    "bits": [bloom.to_bytes()], "n_items": [n_items],
                    "_path": [""],
                }
            )
        )
        cols = ["kind"] + _CAND_COLS + ["maybe_seen", "bits", "n_items", "_path"]
        return pd.concat(parts, ignore_index=True)[cols]

    return fn


def _make_merge_fn(cfg: "CrawlConfig"):
    def merge(key: tuple, new_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(shard_pdf):
            bloom = _filter_from_bytes(bytes(shard_pdf["bits"].iloc[0]))
            n_items = int(shard_pdf["n_items"].iloc[0])
        else:
            bloom = _new_filter(cfg)
            n_items = 0
        if len(new_pdf):
            hashes = new_pdf["url_hash"].to_numpy()
            if isinstance(bloom, CuckooShard):
                bloom.insert(hashes)
            else:
                bloom.add(hashes)
            n_items += len(new_pdf)
        return pd.DataFrame(
            {"shard": [int(key[0])], "bits": [bloom.to_bytes()], "n_items": [n_items]}
        )

    return merge


_SHARDS_SCHEMA = "shard int, bits binary, n_items long"


def _with_identity(df: DataFrame, n_shards: int) -> DataFrame:
    """Request identity (CRAWL CONTRACT v3): the hashed (verb, url,
    post_data) triple — the reference dedups requests, not urls (SURVEY.md
    §1.1: Request carries verb + post data). DataFrames without request
    columns get GET/'' defaults, so url-only callers hash identically to a
    plain GET."""
    if "verb" not in df.columns:
        df = df.withColumn("verb", F.lit("GET"))
    if "post_data" not in df.columns:
        df = df.withColumn("post_data", F.lit(""))
    return df.withColumn(
        "url_hash", F.xxhash64("verb", "url", "post_data")
    ).withColumn("shard", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int"))


def crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: list[str] | DataFrame,
    config: CrawlConfig | None = None,
    robots: DataFrame | None = None,
    dictionary: DataFrame | None = None,
    host_components: DataFrame | None = None,
) -> CrawlResult:
    """host_components: optional (netloc string, component long/string) —
    typically operators.graph.connected_components over the host link
    graph. When given, the politeness budget binds per COMPONENT (mirror
    cluster) instead of per host: member hosts share one budget pool sized
    by the politest member (min of their per-host budgets), so a site
    mirrored across n hostnames gets budget, not budget*n, per wave.
    Hosts absent from the mapping keep per-host budgeting."""
    cfg = config or CrawlConfig()

    if isinstance(seeds, DataFrame):
        seed_urls = [r[0] for r in seeds.select("url").collect()]
    else:
        seed_urls = list(seeds)
    seed_canon = sorted({u for u in (canonicalize(s) for s in seed_urls) if u})
    allowed = cfg.allowed_netlocs or sorted({netloc_of(u) for u in seed_canon})
    # Small allow-lists inline as an `isin` literal (codegen-friendly); an
    # open-web crawl with 10^5+ allowed hosts would bloat every wave's plan
    # with a giant literal, so large lists become a broadcast semi-join.
    allowed_df = None
    if len(allowed) > _ISIN_MAX_NETLOCS:
        allowed_df = F.broadcast(
            spark.createDataFrame([(n,) for n in allowed], "netloc string")
        )

    # Fetch source: version dedup (as-of max warc_ts) happens per wave on the
    # *matched* rows only — joining first and deduping after means the big
    # html column is never shuffled corpus-wide or columnar-cached. AQE picks
    # the join strategy at runtime: broadcast while the elected set is small,
    # sort-merge against the (bucketed, at scale) pages table when it is not.
    bucketed_fetch = (
        cfg.pages_buckets is not None and catalog_mod.PAGES_BUCKET_COL in pages.columns
    )
    if bucketed_fetch:
        # Guard against a modulus mismatch (would read the wrong partitions
        # and surface as phantom 404s). The layout sidecar is authoritative
        # — it records what the writer actually used, so a mismatch is
        # caught even when a row sample happens to agree (pmod(h, 2N) ==
        # pmod(h, N) for half of all hashes). Sidecar-less inputs (hand-laid
        # directories) fall back to the row sample.
        root = catalog_mod.infer_bucketed_root(pages.inputFiles())
        sidecar_n = (
            catalog_mod.pages_sidecar_buckets(spark, root) if root else None
        )
        if sidecar_n is not None:
            if sidecar_n != cfg.pages_buckets:
                raise ValueError(
                    f"pages layout at {root} was written with "
                    f"n_buckets={sidecar_n} (sidecar), but "
                    f"pages_buckets={cfg.pages_buckets} was configured"
                )
        else:
            bad = (
                pages.select("url", catalog_mod.PAGES_BUCKET_COL).limit(100)
                .filter(
                    catalog_mod.bucket_of(F.col("url"), cfg.pages_buckets)
                    != F.col(catalog_mod.PAGES_BUCKET_COL)
                )
                .count()
            )
            if bad:
                raise ValueError(
                    f"pages.{catalog_mod.PAGES_BUCKET_COL} does not match "
                    f"pmod(xxhash64(url), {cfg.pages_buckets}) — wrong pages_buckets?"
                )
    fetch_cols = ["url", "warc_ts", "html"] + (
        [catalog_mod.PAGES_BUCKET_COL] if bucketed_fetch else []
    )
    pages_slim = pages.select(*fetch_cols)
    if robots is None:
        robots = robots_from_pages(pages)
    robots = robots.persist()

    budgets = robots.mapInPandas(
        _budgets_fn(cfg.budget_per_host), _BUDGET_SCHEMA
    ).persist()
    # persisted in ARRAY form (one row per netloc): every wave's gate join
    # is fan-out-free and needs no re-aggregation (_robots_gate)
    rules = _rules_array(
        robots.mapInPandas(_compile_rules_batches, _RULES_SCHEMA)
    ).persist()

    comp_map = None
    if host_components is not None:
        # static per-crawl mapping netloc -> (election group, group budget):
        # the group budget is the MIN member budget — the politest member
        # governs the whole mirror cluster. Computed once (host-table-sized,
        # tiny next to the frontier); each wave's election joins it.
        per_host = (
            host_components.select(
                "netloc", F.col("component").cast("string").alias("_comp")
            )
            .join(budgets, "netloc", "left")
            .withColumn("budget", F.coalesce("budget", F.lit(cfg.budget_per_host)))
        )
        grp_budget = per_host.groupBy("_comp").agg(
            F.min("budget").alias("_gbudget")
        )
        comp_map = (
            per_host.join(grp_budget, "_comp")
            .select(
                "netloc",
                # '\n' can never appear in a netloc (host[:port] — urlsplit
                # rejects control characters), so the prefix cannot collide
                # with a real netloc group key. NOTE: ':' was the old
                # separator and CAN occur in a netloc (non-default port,
                # functions/urls.py keeps it): a host literally named
                # 'component' with port N would have collided with the
                # component-N pool and silently shared its election.
                F.concat(F.lit("component\n"), "_comp").alias("_grp"),
                "_gbudget",
            )
            .persist()
        )

    # Collect the spelling dictionary ONCE for all waves: checkers fold it
    # into the fused findings scan as an array_except literal (checkers.py
    # _checker_structs) — same smallness assumption its broadcast made.
    dict_words = None
    if dictionary is not None and cfg.run_checkers:
        dict_words = sorted({r["word"] for r in
                             dictionary.select("word").collect()})

    frontier_cols = ["url", "netloc", "depth", "priority", "referrer",
                     "redirects", "verb", "post_data"]
    seeds_df = spark.createDataFrame(
        [(u, netloc_of(u), 0, 0.0, "", 0, "GET", "") for u in seed_canon],
        schema="url string, netloc string, depth int, priority double, "
               "referrer string, redirects int, verb string, post_data string",
    )

    fetch_logs: list[DataFrame] = []
    findings: list[DataFrame] = []
    metrics: list[dict] = []

    empty_log = spark.createDataFrame(
        [], "url string, netloc string, wave int, depth int, priority double, "
            "referrer string, verb string, post_data string, "
            "status int, content_len long, n_links int",
    )
    empty_findings = spark.createDataFrame([], FINDINGS_SCHEMA)

    catalog = (
        WaveCatalog(cfg.checkpoint_dir, spark) if cfg.checkpoint_dir else None
    )
    resumed_from = catalog.last_committed_wave() if catalog else None

    pending_findings: list[DataFrame] = []  # pre-wave-0 (seed gating) findings
    shards: DataFrame | None = None
    force_seen_full = False  # set when resume migrated the seen schema

    if resumed_from is not None:
        # Resume-exactly: rebuild state from the last committed wave.
        frontier = catalog.read_table(spark, "frontier", resumed_from)
        if "redirects" not in frontier.columns:  # pre-contract-v2 checkpoint
            frontier = frontier.withColumn("redirects", F.lit(0))
        if "verb" not in frontier.columns:  # pre-contract-v3 checkpoint
            frontier = frontier.withColumn("verb", F.lit("GET")).withColumn(
                "post_data", F.lit("")
            )
        frontier = frontier.localCheckpoint(eager=True)
        seen = catalog.read_state(spark, "seen", resumed_from)
        ck_cfg = (catalog.read_manifest() or {}).get("config", {})
        # Shard bits are only reusable if they were built under the SAME
        # identity hash, shard modulus, and filter kind as this run probes
        # with; otherwise probe false-negatives skip the exact anti-join
        # and silently re-enqueue crawled urls. Old manifests lack the
        # keys -> assume compatible (pre-guard behavior).
        rebuild_shards = (
            ck_cfg.get("n_shards", cfg.n_shards) != cfg.n_shards
            or ck_cfg.get("filter_kind", cfg.filter_kind) != cfg.filter_kind
            or not catalog.has_table("shards", resumed_from)
        )
        if "verb" not in seen.columns:
            # pre-contract-v3 checkpoint: the stored url_hash/shard (and
            # the bloom bits built from them) hash the URL ALONE; v3
            # identity is xxhash64(verb, url, post_data). Migrating by
            # defaulting verb/post_data but keeping stale hashes would
            # false-negative every bloom probe — drop and recompute the
            # identity, then rebuild the shards from the exact seen set.
            seen = _with_identity(seen.drop("url_hash", "shard"), cfg.n_shards)
            rebuild_shards = True
            # The recomputed identity exists only in memory; the on-disk
            # base snapshot is still pre-v3 (url-only schema). If this run
            # committed only deltas, a SECOND resume would read_state a
            # mixed-schema base+delta chain (parquet multi-path read, no
            # mergeSchema) — base rows get null verb/post_data or deltas
            # lose POST identity, and crawled requests silently re-fetch.
            # Force the first commit of the resumed run to be a full v3
            # snapshot so the on-disk chain is schema-uniform again.
            force_seen_full = True
        seen = seen.localCheckpoint(eager=True)
        if cfg.use_bloom:
            if rebuild_shards:
                shards = _merge_shards(spark, seen, None, cfg)
            else:
                shards = catalog.read_table(spark, "shards", resumed_from)
                shards = shards.localCheckpoint(eager=True)
        wave = resumed_from + 1
    else:
        # Gate the seeds (wave 0 of the contract).
        gated_seeds = _robots_gate(seeds_df, rules, frontier_cols)
        blocked_seeds = gated_seeds.filter(~F.col("robots_allowed"))
        pending_findings.append(
            blocked_seeds.select(
                F.lit("robots").alias("module"), "url", F.lit(0).alias("wave"),
                F.lit("robots_blocked").alias("detail"), "referrer",
            )
        )
        frontier = gated_seeds.filter("robots_allowed").select(*frontier_cols)
        frontier = frontier.localCheckpoint(eager=True)

        seen = _with_identity(
            seeds_df.select("url", "verb", "post_data"), cfg.n_shards
        ).localCheckpoint(eager=True)
        if cfg.use_bloom:
            shards = _merge_shards(spark, seen, None, cfg)
        wave = 0

    # `seen` is maintained as a UNION of checkpointed leaves: one base
    # snapshot plus one delta per wave since the last compaction. Each wave
    # checkpoints only its delta — checkpointing the union would rewrite
    # the full cumulative seen set every wave, the same O(|seen|)-per-wave
    # cost the catalog's delta commits eliminate on disk. Compaction every
    # seen_compact_every waves collapses the union so plan fan-in and
    # cached-leaf count stay bounded.
    seen_parts: list[DataFrame] = [seen]

    n_frontier = frontier.count()
    end_wave = wave
    _sess_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        while n_frontier > 0 and wave < cfg.max_waves:
            t_wave = time.time()
            # Scope this wave's shuffles to the frontier volume: a wave's
            # exchanges move slim ~150 B frontier/candidate rows (the html
            # shuffle is separately sized by n_parse below), and planning
            # them at the session's corpus-scale width degrades the ~30
            # stages per wave into near-empty tasks whose scheduling
            # barriers dominate (functions/tuning.py; measured ~54 -> ~47 s
            # on the 120k-page bench crawl). Floor 8, capped at the session
            # value so a 10^7-row frontier keeps full-width partitioning.
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(min(_sess_parts,
                        max(-(-n_frontier // _WAVE_ROWS_PER_PARTITION),
                            min(8, _sess_parts)))),
            )
            prev_frontier, prev_shards = frontier, shards
            wave_logs: list[DataFrame] = []
            wave_findings: list[DataFrame] = list(pending_findings)
            pending_findings = []
            # Persist both election outputs: they feed several downstream jobs
            # (broadcast of elected urls, the fetch join, the 404 split, next
            # frontier) which would otherwise each recompute the window chain —
            # the profiler showed half the wave's CPU inside broadcast-exchange
            # recomputations before this.
            # NOTE (r7): an "identity election" fast path was tried here —
            # skip _elect when n_frontier <= min(all budgets), since the
            # election is then provably the identity (the equivalence is
            # pinned by tests/test_crawl_golden.py::
            # test_identity_election_fast_path_equals_elect). It was
            # REVERTED: bisected as the cause of executor heap OOMs at the
            # 1.2M-page xheavy scaling point (N-level local-cluster[2,4,8g]
            # died at ~wave 2 with the fast path, completed in 369 s
            # without it — see OPTIMIZATION_r07.md X-H). The ~1 s/wave of
            # election stages it saved on the 120k bench is not worth a
            # memory-behavior change at scale that was never fully
            # root-caused.
            elected, remainder = _elect(frontier, budgets, cfg, comp_map)
            elected = elected.persist()
            remainder = remainder.persist()

            elected_urls = elected.select("url")
            fetch_keys = ["url"]
            if bucketed_fetch:
                elected_urls = elected_urls.withColumn(
                    catalog_mod.PAGES_BUCKET_COL,
                    catalog_mod.bucket_of(F.col("url"), cfg.pages_buckets),
                )
                fetch_keys = [catalog_mod.PAGES_BUCKET_COL, "url"]
            # Parse parallelism ∝ cores, not bytes: AQE's byte-based coalescing
            # would starve the CPU-bound parse stage. Decided BEFORE the fetch
            # join so the html shuffle lands directly in n_parse partitions.
            n_parse = cfg.parse_partitions or max(
                2 * spark.sparkContext.defaultParallelism,
                -(-n_frontier // cfg.parse_rows_per_partition),  # ceil div
            )
            # html crosses EXACTLY ONE shuffle per wave in BOTH fetch modes
            # (plan-asserted in tests/test_plans.py, incl. the max_by partial
            # buffer that smuggles html under a fresh attribute name):
            # - broadcast fetch: the join is exchange-free; one explicit
            #   repartition(n_parse, url) feeds the version-dedup agg, which
            #   reuses that partitioning (no second exchange).
            # - shuffle fetch (bucketed layout): the join's own Ensure-exchange
            #   of the pages side IS the html shuffle. Pre-partitioning the slim
            #   elected side on the join keys into n_parse makes that exchange
            #   land directly in n_parse partitions, and aggregating on the SAME
            #   keys (url_bucket is a function of url, so groupBy(bucket, url)
            #   == groupBy(url)) reuses the join partitioning — aggregating on
            #   url alone would re-exchange the max_by buffer (= html bytes).
            # Downstream, the elected-side left join uses the agg's keys too, so
            # only slim frontier columns shuffle and the parse pass inherits the
            # n_parse partitions unchanged.
            if cfg.pages_prebucketed:
                # bucketed-table fetch: the pages scan reports
                # HashPartitioning(url, n_buckets), so EnsureRequirements
                # shuffles ONLY the slim elected side into the buckets; the
                # dedup agg below groups on the same key and reuses the join
                # partitioning — html never crosses an exchange (plan-asserted
                # with a zero count in tests/test_plans.py).
                matched = pages_slim.join(elected_urls, fetch_keys)
                agg_in = matched
                agg_keys = ["url"]
            elif cfg.broadcast_fetch:
                matched = pages_slim.join(F.broadcast(elected_urls), fetch_keys)
                agg_in = matched.repartition(n_parse, "url")
                agg_keys = ["url"]
            else:
                matched = pages_slim.join(
                    elected_urls.repartition(n_parse, *fetch_keys), fetch_keys
                )
                agg_in = matched
                agg_keys = fetch_keys
            latest_rows = agg_in.groupBy(*agg_keys).agg(
                # total tie-break on (warc_ts, md5(html)) — see latest_pages()
                F.max_by("html", F.struct("warc_ts", F.md5("html"))).alias("html")
            )
            # One corpus scan+join per wave, consumed EXACTLY ONCE by the parse
            # pass: fetch misses flow through as status=404 rows (null-html fast
            # path inside parse_pages_batch), so the html-carrying join output is
            # never persisted — only the slim parsed table is. Caching the join
            # output instead (round <= 4) meant every downstream `html IS NULL`
            # filter re-read the cached html column batches: ~15 GB/run of the
            # fetch-log job's input in the round-4 scaling stage tables was
            # exactly that traffic.
            if agg_keys == ["url"]:
                fetched = elected.join(latest_rows, "url", "left")
            else:
                fetched = (
                    elected.withColumn(
                        catalog_mod.PAGES_BUCKET_COL,
                        catalog_mod.bucket_of(F.col("url"), cfg.pages_buckets),
                    )
                    .join(latest_rows, agg_keys, "left")
                    .drop(catalog_mod.PAGES_BUCKET_COL)
                )
            parsed = (
                fetched.select("url", "netloc", F.lit(wave).alias("wave"), "depth",
                               "priority", "referrer", "redirects", "verb",
                               "post_data", "html")
                .mapInPandas(parse_pages_batch, PARSED_SCHEMA)
            ).persist()
            ok = parsed.filter(F.col("status") == 200)

            wave_logs.append(
                parsed.select(
                    "url", "netloc", "wave", "depth", "priority", "referrer",
                    "verb", "post_data", "status", "content_len", "n_links",
                )
            )
            # ALL per-page findings — broken_link + redirect cap + checkers —
            # from ONE scan of the parsed cache (every separate filter branch
            # would fetch the full cached batches again; robots findings join
            # the gated frontier below instead)
            page_findings, checker_handle = wave_findings_pass(
                parsed, cfg.max_redirects, dict_words,
                checkers=cfg.run_checkers,
            )
            wave_findings.append(page_findings)

            # Candidate edges: outlinks (depth+1, fresh redirect counter) plus
            # meta-refresh redirect targets (same depth, hop counter +1 along the
            # chain — the reference's Request carries a redirect count with a
            # cap; over-cap chains are findings, not candidates) plus POST form
            # requests (CONTRACT v3: identity is (verb, url, post_data), so a
            # POSTed url is crawled independently of its GET twin).
            # All three kinds are emitted from ONE scan of the parsed cache as
            # a concatenated per-row struct array with a single explode — the
            # r6 shape ran three separate filter branches over the cache and
            # unioned them, fetching the full cached batches three times per
            # wave (the dominant input volume of the wave_probe_gate phase:
            # 1.75 GB/run at the 120k-page bench; guide §2.4 / §5 cache notes).
            _cand_struct_t = ("array<struct<url:string,depth:int,"
                              "redirects:int,verb:string,post_data:string>>")
            _empty_cand = F.array().cast(_cand_struct_t)
            depth_ok = (F.col("depth") + 1) <= cfg.max_depth
            out_arr = F.when(depth_ok, F.transform(
                "outlinks",
                lambda u: F.struct(
                    u.alias("url"), (F.col("depth") + 1).alias("depth"),
                    F.lit(0).alias("redirects"), F.lit("GET").alias("verb"),
                    F.lit("").alias("post_data"),
                ),
            ))
            red_arr = F.when(
                F.col("redirect").isNotNull()
                & (F.col("redirects") + 1 <= cfg.max_redirects),
                F.array(F.struct(
                    F.col("redirect").alias("url"), F.col("depth").alias("depth"),
                    (F.col("redirects") + 1).alias("redirects"),
                    F.lit("GET").alias("verb"), F.lit("").alias("post_data"),
                )),
            )
            form_arr = F.when(depth_ok, F.transform(
                "post_forms",
                lambda f: F.struct(
                    f["url"].alias("url"), (F.col("depth") + 1).alias("depth"),
                    F.lit(0).alias("redirects"), F.lit("POST").alias("verb"),
                    f["data"].alias("post_data"),
                ),
            ))
            cand = (
                ok.select(
                    F.col("url").alias("referrer"),
                    F.explode(F.concat(
                        F.coalesce(out_arr, _empty_cand),
                        F.coalesce(red_arr, _empty_cand),
                        F.coalesce(form_arr, _empty_cand),
                    )).alias("c"),
                )
                .select(
                    F.col("c.url").alias("url"), "referrer",
                    F.col("c.depth").alias("depth"),
                    F.col("c.redirects").alias("redirects"),
                    F.col("c.verb").alias("verb"),
                    F.col("c.post_data").alias("post_data"),
                )
                .withColumn("path", F.coalesce(F.parse_url("url", F.lit("PATH")), F.lit("")))
                .filter(~F.lower("path").rlike(_EXT_PATTERN))
                .withColumn("netloc", F.parse_url("url", F.lit("HOST")))
            )
            cand = (
                cand.join(allowed_df, "netloc", "left_semi")
                if allowed_df is not None
                else cand.filter(F.col("netloc").isin(allowed))
            )
            cand = (
                # dedup by request IDENTITY (verb, url, post_data) — contract v3
                cand.groupBy("url", "netloc", "verb", "post_data")
                .agg(F.min(F.struct("depth", "referrer", "redirects")).alias("m"))
                .select(
                    "url", "netloc", "verb", "post_data",
                    F.col("m.depth").alias("depth"),
                    F.col("m.depth").cast("double").alias("priority"),
                    F.col("m.referrer").alias("referrer"),
                    F.col("m.redirects").alias("redirects"),
                )
            )
            cand = _with_identity(cand, cfg.n_shards)

            fused_handle = None
            if cfg.use_bloom and shards is not None:
                new, new_shards, fused_handle = _probe_and_absorb(cand, seen, shards, cfg)
            else:
                new = cand.join(
                    seen.select("verb", "url", "post_data"),
                    ["verb", "url", "post_data"], "left_anti",
                )
                new_shards = None

            gated = _robots_gate(
                new, rules, frontier_cols + ["url_hash", "shard"]
            ).persist()
            wave_findings.append(
                gated.filter(~F.col("robots_allowed")).select(
                    F.lit("robots").alias("module"), "url", F.lit(wave).alias("wave"),
                    F.lit("robots_blocked").alias("detail"), "referrer",
                )
            )

            # One job forces the whole heavy chain (elect -> fetch -> parse ->
            # candidates -> probe -> gate) into the wave's caches...
            # (callSite.short labels land in the UI stage names so the scaling
            # telemetry (plans/stagemetrics.py) attributes task time to engine
            # phases instead of merging everything under "count at <unknown>")
            sc = spark.sparkContext
            t0 = time.time()
            if cfg.phase_labels:
                # attribution mode: see CrawlConfig.phase_labels
                sc.setLocalProperty("callSite.short", "wave_elect")
                elected.count()
                sc.setLocalProperty("callSite.short", "wave_fetch_parse")
                parsed.count()
                sc.setLocalProperty("callSite.short", "wave_probe_gate")
            else:
                sc.setLocalProperty("callSite.short", "wave_chain")
            gated.count()
            sc.setLocalProperty("callSite.short", None)
            t_chain = time.time() - t0

            # ...then the five independent state/delta materializations read
            # those caches CONCURRENTLY. Sequentially they cost sum(latencies)
            # of mostly-idle barrier time per wave; in parallel, max(latencies).
            new_frontier_rows = gated.filter("robots_allowed").select(*frontier_cols)
            frontier_next = remainder.select(*frontier_cols).unionByName(new_frontier_rows)
            new_seen = gated.select("url", "verb", "post_data", "url_hash", "shard")
            log_delta = _union_all(wave_logs, empty_log)
            findings_delta = _union_all(wave_findings, empty_findings)
            compact = force_seen_full or wave % cfg.seen_compact_every == 0

            t0 = time.time()
            from concurrent.futures import ThreadPoolExecutor

            def _ckpt(df, label):
                # per-thread callSite label: pinned-thread mode (the PySpark
                # default) maps each Python thread to its own JVM thread, so
                # every concurrent state job's stages carry its table name
                spark.sparkContext.setLocalProperty("callSite.short", label)
                return df.localCheckpoint(eager=True)

            with ThreadPoolExecutor(max_workers=5) as pool:
                f_frontier = pool.submit(_ckpt, frontier_next, "ckpt_frontier")
                # seen checkpoints as this wave's DELTA; the full union only on
                # compaction waves (see seen_parts above)
                f_seen = pool.submit(
                    _ckpt,
                    seen.unionByName(new_seen) if compact else new_seen,
                    "ckpt_seen_full" if compact else "ckpt_seen_delta",
                )
                f_shards = (
                    pool.submit(_ckpt, new_shards, "ckpt_shards")
                    if new_shards is not None else None
                )
                f_log = pool.submit(_ckpt, log_delta, "ckpt_fetch_log")
                f_findings = pool.submit(_ckpt, findings_delta, "ckpt_findings")
                frontier = f_frontier.result()
                if compact:
                    seen = f_seen.result()
                    for part in seen_parts:  # superseded by the collapsed union
                        part.unpersist()
                    seen_parts = [seen]
                else:
                    delta_ck = f_seen.result()
                    seen_parts.append(delta_ck)
                    seen = seen.unionByName(delta_ck)
                log_delta = f_log.result()
                findings_delta = f_findings.result()
                if f_shards is not None:
                    shards = f_shards.result()
                elif cfg.use_bloom:
                    shards = _merge_shards(spark, new_seen, shards, cfg)
            t_state = time.time() - t0

            fetch_logs.append(log_delta)
            findings.append(findings_delta)

            t0 = time.time()
            sc.setLocalProperty("callSite.short", "frontier_count")
            n_frontier = frontier.count()
            sc.setLocalProperty("callSite.short", None)
            t_count = time.time() - t0
            # Release superseded per-wave checkpoints: without this, a long crawl
            # leaks one cached RDD per wave per state table and everything after
            # it pays the GC/block-manager tax. (seen deltas are NOT superseded
            # — they compose the live union until a compaction wave collapses
            # them, handled above.)
            prev_frontier.unpersist()
            if prev_shards is not None and shards is not prev_shards:
                prev_shards.unpersist()
            wave_metrics = {"wave": wave, "n_frontier_next": n_frontier}
            metrics.append(wave_metrics)

            if catalog is not None:
                # seen commits as this wave's DELTA (new_seen), with a full
                # compaction snapshot every seen_compact_every waves (same
                # cadence as the in-memory collapse above); frontier and shards
                # stay full-state (frontier is the small active set, shards a
                # fixed count of fixed-size filters). Wave 0 lands on the
                # compaction branch, so a delta chain always has a base.
                state = {"frontier": frontier, "seen": seen if compact else new_seen}
                if shards is not None:
                    state["shards"] = shards
                catalog.commit_wave(
                    wave, state,
                    {"fetch_log": log_delta, "findings": findings_delta},
                    metrics=wave_metrics,
                    config={"budget_per_host": cfg.budget_per_host,
                            "max_depth": cfg.max_depth, "seeds": seed_canon,
                            "n_shards": cfg.n_shards,
                            "filter_kind": cfg.filter_kind},
                    state_kinds={"seen": "full" if compact else "delta"},
                )

            elected.unpersist()
            remainder.unpersist()
            parsed.unpersist()
            gated.unpersist()
            if fused_handle is not None:
                fused_handle.unpersist()
            if checker_handle is not None:
                checker_handle.unpersist()
            if cfg.verbose:
                print(f"[crawl] wave={wave} next_frontier={n_frontier} "
                      f"wall={time.time()-t_wave:.2f}s "
                      f"(chain={t_chain:.1f} state={t_state:.1f} "
                      f"count={t_count:.1f})", flush=True)
            force_seen_full = False  # migration snapshot committed (first wave)
            end_wave = wave + 1
            wave += 1
    finally:
        # the wave scope is session-wide state — always restore it
        spark.conf.set("spark.sql.shuffle.partitions", str(_sess_parts))

    findings.extend(pending_findings)  # loop never ran (e.g. all seeds blocked)

    robots.unpersist()
    budgets.unpersist()
    if comp_map is not None:
        comp_map.unpersist()
    rules.unpersist()

    if catalog is not None and catalog.last_committed_wave() is not None:
        last = catalog.last_committed_wave()
        fetch_log = catalog.read_deltas_through(spark, "fetch_log", last)
        findings_df = catalog.read_deltas_through(spark, "findings", last)
    else:
        fetch_log = _union_all(fetch_logs, empty_log)
        findings_df = _union_all(findings, empty_findings)
    cached = [*fetch_logs, *findings, *seen_parts, frontier]
    if shards is not None:
        cached.append(shards)
    return CrawlResult(
        fetch_log=fetch_log, findings=findings_df, seen=seen, waves=end_wave,
        metrics=metrics, shards=shards, _cached=cached,
    )


def _union_all(dfs: list[DataFrame], empty: DataFrame) -> DataFrame:
    """Union the deltas; `empty` only anchors the schema when dfs is empty.
    (Seeding the fold with it added its defaultParallelism-many EMPTY
    partitions to every per-wave delta, and each wave's log/findings
    checkpoint then scheduled that many no-op tasks.)"""
    if not dfs:
        return empty
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def _elect(
    frontier: DataFrame, budgets: DataFrame, cfg: CrawlConfig,
    comp_map: DataFrame | None = None,
):
    """Per-group top-budget election (W1/W2/J5), skew-proof. The group is
    the netloc by default; with `comp_map` (netloc -> mirror-cluster group
    + pooled budget, built in crawl() from connected_components output),
    member hosts share one election pool — per-component crawl budgeting.

    Fast path first: groups whose pending count fits their budget are
    elected wholesale — no sort, no window. Only over-budget groups enter
    the ranking path, which is two-phase salted: phase 1 ranks within
    (group, salt) so one skew group cannot pin a single reducer; phase 2
    ranks the <= B*salt_buckets survivors per group. Exact: any row in a
    group's global top-B is in the top-B of its salt bucket, so phase 1
    never cuts a winner. Without the fast path, a group with pending >>
    budget=∞ (throughput mode) or simply 50% of the frontier would
    serialize the whole wave through one window task.
    """
    fr = frontier.join(budgets, "netloc", "left").withColumn(
        "budget", F.coalesce("budget", F.lit(cfg.budget_per_host))
    )
    if comp_map is not None:
        fr = (
            fr.join(comp_map, "netloc", "left")
            .withColumn("_grp", F.coalesce("_grp", "netloc"))
            .withColumn("budget", F.coalesce("_gbudget", "budget"))
            .drop("_gbudget")
        )
    else:
        fr = fr.withColumn("_grp", F.col("netloc"))
    host_counts = fr.groupBy("_grp").agg(F.count("*").alias("n_pending"))
    fr = fr.join(host_counts, "_grp")
    under = fr.filter(F.col("n_pending") <= F.col("budget"))
    over = fr.filter(F.col("n_pending") > F.col("budget"))

    elected_fast = under.drop("budget", "n_pending", "_grp")

    over = over.withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(cfg.salt_buckets)).cast("int")
    )
    # total crawl order (contract v3): (priority, url, verb, post_data)
    w1 = Window.partitionBy("_grp", "salt").orderBy(
        "priority", "url", "verb", "post_data"
    )
    over = over.withColumn("rk1", F.row_number().over(w1))
    surv = over.filter(F.col("rk1") <= F.col("budget"))
    spill0 = over.filter(F.col("rk1") > F.col("budget"))
    w2 = Window.partitionBy("_grp").orderBy(
        "priority", "url", "verb", "post_data"
    )
    surv = surv.withColumn("rk2", F.row_number().over(w2))
    elected_ranked = surv.filter(F.col("rk2") <= F.col("budget")).drop(
        "budget", "n_pending", "_grp", "salt", "rk1", "rk2"
    )
    spill1 = surv.filter(F.col("rk2") > F.col("budget"))
    remainder = spill0.drop("budget", "n_pending", "_grp", "salt", "rk1").unionByName(
        spill1.drop("budget", "n_pending", "_grp", "salt", "rk1", "rk2")
    )
    return elected_fast.unionByName(elected_ranked), remainder


def _match_path_fn(cols: list[str]):
    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out["_path"] = [robots_mod.match_path(u) for u in pdf["url"]]
            yield out

    return fn


def _rules_array(rules: DataFrame) -> DataFrame:
    """(netloc, _rules: array<struct<seq,prefix,allow>> sorted by seq) from
    the long-form compiled rule rows. seq is unique per netloc, so
    array_sort orders exactly by file position."""
    return rules.groupBy("netloc").agg(
        F.array_sort(
            F.collect_list(F.struct("seq", "prefix", "allow"))
        ).alias("_rules")
    )


def _robots_gate(df: DataFrame, rules: DataFrame, passthrough: list[str]) -> DataFrame:
    """R1 gate: join pre-compiled per-netloc rule ARRAYS on netloc; the
    first-match election (first matching rule in file order decides, no
    rule -> allow) runs row-locally over the array — no post-join
    re-aggregation. The r6 shape joined LONG-form rule rows and collapsed
    the multiplied rows with a groupBy over every passthrough column: one
    full exchange of the gated candidate set per wave whose only job was
    undoing the join fan-out (guide §2.4: remove shuffles outright). The
    match string is robotparser's own (robots.match_path, computed in ONE
    vectorized pass — each url is gated exactly once in its lifetime, so
    this is a one-shot Arrow round-trip per url, not per wave). Catalyst
    broadcasts the host-table-sized rules side when small; at web scale it
    shuffle-joins on netloc (still fan-out-free: one row per netloc).

    Accepts either the long form (aggregated here) or a pre-aggregated
    `_rules` DataFrame (the crawl loop persists the aggregate once). A df
    that ALREADY carries `_path` (the crawl's probe cogroup computes it
    in-band, _make_probe_merge_fn) skips the mapInPandas pass entirely —
    the gate is then join + row-local array election, no Python at all."""
    if "_rules" not in rules.columns:
        rules = _rules_array(rules)
    first_hit = F.get(
        F.filter(
            F.col("_rules"),
            lambda r: (r["prefix"] == "") | (r["prefix"] == "*")
            | F.col("_path").startswith(r["prefix"]),
        ),
        0,
    )
    if "_path" in df.columns:
        with_path = df
    else:
        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in df.select(*passthrough).schema
        ) + ", _path string"
        with_path = df.mapInPandas(_match_path_fn(list(passthrough)), schema)
    return (
        with_path.join(rules, "netloc", "left")
        .select(
            *passthrough,
            F.coalesce(first_hit["allow"], F.lit(True)).alias("robots_allowed"),
        )
    )


def _probe_and_absorb(
    cand: DataFrame, seen: DataFrame, shards: DataFrame, cfg: CrawlConfig
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """A1 + J2 fused: one cogroup probes the bloom AND absorbs this wave's
    candidate hashes into it. Returns (new, new_shards, fused_handle);
    caller unpersists fused_handle once new/new_shards are materialized.
    The exact anti-join runs only on bloom-positive candidates."""
    fused = (
        cand.groupby("shard")
        .cogroup(shards.select("shard", "bits", "n_items").groupby("shard"))
        .applyInPandas(_make_probe_merge_fn(cfg), _FUSED_SCHEMA)
        .persist()
    )
    new_shards = fused.filter(F.col("kind") == 1).select("shard", "bits", "n_items")
    probed = fused.filter(F.col("kind") == 0).select(
        *_CAND_COLS, "maybe_seen", "_path"
    )
    definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = maybe.join(
        seen.select("verb", "url", "post_data"),
        ["verb", "url", "post_data"], "left_anti",
    )
    return definitely_new.unionByName(confirmed_new), new_shards, fused


def _merge_shards(
    spark: SparkSession, new_seen: DataFrame, shards: DataFrame | None, cfg: CrawlConfig
) -> DataFrame:
    if shards is None:
        shards = spark.createDataFrame([], _SHARDS_SCHEMA)
    merged = (
        new_seen.select("shard", "url_hash")
        .groupby("shard")
        .cogroup(shards.groupby("shard"))
        .applyInPandas(_make_merge_fn(cfg), _SHARDS_SCHEMA)
    )
    return merged.localCheckpoint(eager=True)


def resolve_redirect_chains(edges: DataFrame, max_hops: int = 4) -> DataFrame:
    """Resolve each redirect source's final destination over an edge table
    (src, dst), hop-capped. Returns (src, final, hops, capped).

    Each iteration is ONE equi-join advancing every unresolved cursor a hop
    — k joins total for a k-hop cap, never an all-pairs or transitive-
    closure expansion, so it scales to web-sized redirect tables. Cycles
    terminate via the cap and surface as capped=true (as does any chain
    longer than max_hops). Assumes functional edges (one outgoing redirect
    per src), which is what meta-refresh/3xx semantics give."""
    cur = edges.select("src", F.col("dst").alias("cur"), F.lit(1).alias("hops"))
    step = edges.select(F.col("src").alias("cur"), F.col("dst").alias("_d"))
    for _ in range(max_hops - 1):
        cur = (
            cur.join(step, "cur", "left")
            .select(
                "src",
                F.coalesce("_d", F.col("cur")).alias("cur"),
                F.when(F.col("_d").isNotNull(), F.col("hops") + 1)
                .otherwise(F.col("hops")).alias("hops"),
            )
        )
    more = edges.select(F.col("src").alias("cur")).distinct().withColumn(
        "_more", F.lit(True)
    )
    return (
        cur.join(more, "cur", "left")
        .select(
            "src", F.col("cur").alias("final"), "hops",
            F.coalesce("_more", F.lit(False)).alias("capped"),
        )
    )


def _make_rebuild_fn(cfg: "CrawlConfig"):
    """Rebuild one shard's filter from scratch out of its exact seen hashes."""

    def fn(key, seen_pdf: pd.DataFrame, _marker_pdf: pd.DataFrame) -> pd.DataFrame:
        filt = _new_filter(cfg)
        n_items = 0
        if len(seen_pdf):
            hashes = seen_pdf["url_hash"].to_numpy()
            if isinstance(filt, CuckooShard):
                filt.insert(hashes)
            else:
                filt.add(hashes)
            n_items = int(len(seen_pdf))
        return pd.DataFrame(
            {"shard": [int(key[0])], "bits": [filt.to_bytes()], "n_items": [n_items]}
        )

    return fn


def forget_urls(
    seen: DataFrame, shards: DataFrame | None, urls: list[str], cfg: CrawlConfig
) -> tuple[DataFrame, DataFrame | None]:
    """Re-crawl support: remove urls from the exact seen set and REBUILD the
    affected probabilistic shards from the remaining exact seen hashes, so a
    subsequent crawl fetches them again. Rebuilding (vs cuckoo delete) is the
    only sound path: a 16-bit cuckoo fingerprint collision would let delete()
    remove a copy belonging to a *different* retained URL, creating a false
    negative that skips the exact anti-join and duplicates that URL in seen.
    Rebuild also makes bloom shards (which cannot delete) forgettable.
    Unaffected shards pass through untouched. Returns (seen, shards)."""
    spark = seen.sparkSession
    canon = sorted({u for u in (canonicalize(u) for u in urls) if u})
    to_del = spark.createDataFrame([(u,) for u in canon], "url string")
    new_seen = seen.join(to_del, "url", "left_anti")
    new_seen = new_seen.localCheckpoint(eager=True)
    if shards is None:
        return new_seen, None
    # affected shards come from the seen rows themselves: forgetting a url
    # forgets EVERY request identity of it (GET and any POSTs), and those
    # identities hash to different shards (contract v3). Collected to a
    # literal frame — it is tiny (<= n_shards rows) and deriving it lazily
    # from `seen` makes every later join with new_seen an ambiguous
    # self-join (both sides would carry seen's own `shard` attribute).
    # Collected only on the shard path: the bloom-disabled caller returns
    # above without paying this job.
    affected_ids = sorted(
        r["shard"]
        for r in seen.join(to_del, "url", "left_semi")
        .select("shard").distinct().collect()
    )
    affected = spark.createDataFrame([(s,) for s in affected_ids], "shard int")
    kept = shards.join(affected, "shard", "left_anti")
    rebuilt = (
        new_seen.join(affected, "shard", "left_semi")
        .select("shard", "url_hash")
        .groupby("shard")
        # cogroup against the affected-shard markers so a shard whose entire
        # seen set was forgotten still re-emits an (empty) filter row
        .cogroup(affected.groupby("shard"))
        .applyInPandas(_make_rebuild_fn(cfg), _SHARDS_SCHEMA)
    )
    new_shards = kept.unionByName(rebuilt).localCheckpoint(eager=True)
    return new_seen, new_shards
