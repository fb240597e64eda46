"""The crawl engine: BFS URL-frontier as iterative DataFrame programs.

Implements CRAWL CONTRACT v1 (golden.py) Spark-first (SURVEY.md §3.2):

    seeds -> frontier(wave 0)
    per wave:
      1. budgets   = robots crawl-delay -> per-netloc budget (join, broadcast
                     when small)
      2. elect     = two-phase salted top-budget per netloc window (W1/W2/J5:
                     phase 1 ranks within (netloc, salt) so one skew host
                     cannot pin a single reducer; phase 2 ranks the <= B*salts
                     survivors per netloc — provably equal to the unsalted
                     global per-host top-B)
      3. fetch     = elected left-join latest pages on url (J1); miss -> 404
      4. parse     = ONE vectorized mapInPandas pass (C6) emitting outlinks +
                     text + title + meta + comments; the only place html is
                     ever read (column pruning, SURVEY.md §4)
      5. checkers  = DataFrame builders over parsed (C2..C5, C7)
      6. cand      = explode(outlinks) -> ext/domain/depth filters ->
                     groupBy(url).min(struct(depth, referrer)) dedupe
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
from dataclasses import dataclass, field
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sitecheck_spark import robots as robots_mod
from sitecheck_spark.checkers import (
    check_comments,
    check_metadata,
    check_regex,
    check_spelling,
)
from sitecheck_spark.extract import PARSED_SCHEMA, parse_pages_batch
from sitecheck_spark.functions.urls import canonicalize, netloc_of
from sitecheck_spark.golden import IGNORED_EXTENSIONS
from sitecheck_spark.seen import BloomShard
from sitecheck_spark.sources.catalog import WaveCatalog


@dataclass
class CrawlConfig:
    budget_per_host: int = 10
    max_waves: int = 50
    max_depth: int = 10
    allowed_netlocs: list[str] | None = None  # default: seed netlocs
    n_shards: int = 32
    salt_buckets: int = 8
    use_bloom: bool = True
    bloom_bits: int = 1 << 17          # per shard; multiple of 8
    bloom_hashes: int = 7
    checkpoint_dir: str | None = None  # enables resumable mode (catalog.py)
    run_checkers: bool = True


@dataclass
class CrawlResult:
    fetch_log: DataFrame
    findings: DataFrame
    seen: DataFrame          # (url, url_hash, shard)
    waves: int = 0
    metrics: list[dict] = field(default_factory=list)


FINDINGS_SCHEMA = "module string, url string, wave int, detail string, referrer string"
_EXT_PATTERN = "(?i)(?:" + "|".join(re.escape(e) for e in IGNORED_EXTENSIONS) + ")$"


def latest_pages(pages: DataFrame) -> DataFrame:
    """As-of pick of the newest warc_ts version per url (W3).

    max_by instead of a window: one partial-aggregating shuffle, no sort —
    the right plan when versions-per-url is small and urls are many.
    """
    return pages.groupBy("url").agg(F.max_by("html", "warc_ts").alias("html"))


def robots_from_pages(pages: DataFrame) -> DataFrame:
    """R1: robots.txt bodies live in the corpus itself."""
    return (
        pages.filter(F.col("url").endswith("/robots.txt"))
        .groupBy(F.parse_url("url", F.lit("HOST")).alias("netloc"))
        .agg(F.max_by("text", "warc_ts").alias("rules"))
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

def _make_probe_fn(cand_cols: list[str]):
    def probe(cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        out = cand_pdf[cand_cols].copy()
        if len(shard_pdf) == 0 or len(cand_pdf) == 0:
            out["maybe_seen"] = False
            return out
        bloom = BloomShard.from_bytes(bytes(shard_pdf["bits"].iloc[0]))
        out["maybe_seen"] = bloom.contains(cand_pdf["url_hash"].to_numpy())
        return out

    return probe


def _make_merge_fn(n_bits: int, n_hashes: int):
    def merge(key: tuple, new_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(shard_pdf):
            bloom = BloomShard.from_bytes(bytes(shard_pdf["bits"].iloc[0]))
            n_items = int(shard_pdf["n_items"].iloc[0])
        else:
            bloom = BloomShard(n_bits, n_hashes)
            n_items = 0
        if len(new_pdf):
            bloom.add(new_pdf["url_hash"].to_numpy())
            n_items += len(new_pdf)
        return pd.DataFrame(
            {"shard": [int(key[0])], "bits": [bloom.to_bytes()], "n_items": [n_items]}
        )

    return merge


_SHARDS_SCHEMA = "shard int, bits binary, n_items long"


def _with_identity(df: DataFrame, n_shards: int) -> DataFrame:
    return df.withColumn("url_hash", F.xxhash64("url")).withColumn(
        "shard", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int")
    )


def crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: list[str] | DataFrame,
    config: CrawlConfig | None = None,
    robots: DataFrame | None = None,
    dictionary: DataFrame | None = None,
) -> CrawlResult:
    cfg = config or CrawlConfig()

    if isinstance(seeds, DataFrame):
        seed_urls = [r[0] for r in seeds.select("url").collect()]
    else:
        seed_urls = list(seeds)
    seed_canon = sorted({u for u in (canonicalize(s) for s in seed_urls) if u})
    allowed = cfg.allowed_netlocs or sorted({netloc_of(u) for u in seed_canon})

    corpus = latest_pages(pages).persist()
    if robots is None:
        robots = robots_from_pages(pages)
    robots = robots.persist()

    budgets = robots.mapInPandas(_budgets_fn(cfg.budget_per_host), _BUDGET_SCHEMA)

    frontier_cols = ["url", "netloc", "depth", "priority", "referrer"]
    seeds_df = spark.createDataFrame(
        [(u, netloc_of(u), 0, 0.0, "") for u in seed_canon],
        schema="url string, netloc string, depth int, priority double, referrer string",
    )

    fetch_logs: list[DataFrame] = []
    findings: list[DataFrame] = []
    metrics: list[dict] = []

    empty_log = spark.createDataFrame(
        [], "url string, netloc string, wave int, depth int, priority double, "
            "referrer string, status int, content_len long, n_links int",
    )
    empty_findings = spark.createDataFrame([], FINDINGS_SCHEMA)

    catalog = WaveCatalog(cfg.checkpoint_dir) if cfg.checkpoint_dir else None
    resumed_from = catalog.last_committed_wave() if catalog else None

    pending_findings: list[DataFrame] = []  # pre-wave-0 (seed gating) findings
    shards: DataFrame | None = None

    if resumed_from is not None:
        # Resume-exactly: rebuild state from the last committed wave.
        frontier = catalog.read_table(spark, "frontier", resumed_from)
        frontier = frontier.localCheckpoint(eager=True)
        seen = catalog.read_table(spark, "seen", resumed_from).localCheckpoint(eager=True)
        if cfg.use_bloom:
            shards = catalog.read_table(spark, "shards", resumed_from)
            shards = shards.localCheckpoint(eager=True)
        wave = resumed_from + 1
    else:
        # Gate the seeds (wave 0 of the contract).
        gated_seeds = _robots_gate(spark, seeds_df, robots, frontier_cols)
        blocked_seeds = gated_seeds.filter(~F.col("robots_allowed"))
        pending_findings.append(
            blocked_seeds.select(
                F.lit("robots").alias("module"), "url", F.lit(0).alias("wave"),
                F.lit("robots_blocked").alias("detail"), "referrer",
            )
        )
        frontier = gated_seeds.filter("robots_allowed").select(*frontier_cols)
        frontier = frontier.localCheckpoint(eager=True)

        seen = _with_identity(seeds_df.select("url"), cfg.n_shards).localCheckpoint(eager=True)
        if cfg.use_bloom:
            shards = _merge_shards(spark, seen, None, cfg)
        wave = 0

    n_frontier = frontier.count()
    end_wave = wave
    while n_frontier > 0 and wave < cfg.max_waves:
        wave_logs: list[DataFrame] = []
        wave_findings: list[DataFrame] = list(pending_findings)
        pending_findings = []
        elected, remainder = _elect(frontier, budgets, cfg)

        fetched = elected.join(corpus, "url", "left")
        missing = fetched.filter(F.col("html").isNull())
        wave_logs.append(
            missing.select(
                "url", "netloc", F.lit(wave).alias("wave"), "depth", "priority",
                "referrer", F.lit(404).alias("status"),
                F.lit(0).cast("long").alias("content_len"), F.lit(0).alias("n_links"),
            )
        )
        wave_findings.append(
            missing.select(
                F.lit("broken_link").alias("module"), "url",
                F.lit(wave).alias("wave"), F.lit("404").alias("detail"), "referrer",
            )
        )

        parsed = (
            fetched.filter(F.col("html").isNotNull())
            .select("url", "netloc", F.lit(wave).alias("wave"), "depth",
                    "priority", "referrer", "html")
            .mapInPandas(parse_pages_batch, PARSED_SCHEMA)
        ).persist()

        wave_logs.append(
            parsed.select(
                "url", "netloc", "wave", "depth", "priority", "referrer",
                F.lit(200).alias("status"), "content_len", "n_links",
            )
        )
        if cfg.run_checkers:
            wave_findings.extend(_run_checkers(parsed, dictionary))

        cand = (
            parsed.filter(F.col("depth") + 1 <= cfg.max_depth)
            .select(
                F.explode("outlinks").alias("url"),
                F.col("url").alias("referrer"),
                (F.col("depth") + 1).alias("depth"),
            )
            .withColumn("path", F.coalesce(F.parse_url("url", F.lit("PATH")), F.lit("")))
            .filter(~F.lower("path").rlike(_EXT_PATTERN))
            .withColumn("netloc", F.parse_url("url", F.lit("HOST")))
            .filter(F.col("netloc").isin(allowed))
            .groupBy("url", "netloc")
            .agg(F.min(F.struct("depth", "referrer")).alias("m"))
            .select(
                "url", "netloc", F.col("m.depth").alias("depth"),
                F.col("m.depth").cast("double").alias("priority"),
                F.col("m.referrer").alias("referrer"),
            )
        )
        cand = _with_identity(cand, cfg.n_shards)

        new = _filter_unseen(cand, seen, shards, cfg)

        gated = _robots_gate(
            spark, new, robots, frontier_cols + ["url_hash", "shard"]
        ).persist()
        wave_findings.append(
            gated.filter(~F.col("robots_allowed")).select(
                F.lit("robots").alias("module"), "url", F.lit(wave).alias("wave"),
                F.lit("robots_blocked").alias("detail"), "referrer",
            )
        )

        new_frontier_rows = gated.filter("robots_allowed").select(*frontier_cols)
        frontier = remainder.select(*frontier_cols).unionByName(new_frontier_rows)
        frontier = frontier.localCheckpoint(eager=True)

        new_seen = gated.select("url", "url_hash", "shard")
        seen = seen.unionByName(new_seen).localCheckpoint(eager=True)
        if cfg.use_bloom:
            shards = _merge_shards(spark, new_seen, shards, cfg)

        fetch_logs.extend(wave_logs)
        findings.extend(wave_findings)

        n_frontier = frontier.count()
        wave_metrics = {"wave": wave, "n_frontier_next": n_frontier}
        metrics.append(wave_metrics)

        if catalog is not None:
            log_delta = _union_all(wave_logs, empty_log)
            findings_delta = _union_all(wave_findings, empty_findings)
            state = {"frontier": frontier, "seen": seen}
            if shards is not None:
                state["shards"] = shards
            catalog.commit_wave(
                wave, state,
                {"fetch_log": log_delta, "findings": findings_delta},
                metrics=wave_metrics,
                config={"budget_per_host": cfg.budget_per_host,
                        "max_depth": cfg.max_depth, "seeds": seed_canon},
            )

        parsed.unpersist()
        gated.unpersist()
        end_wave = wave + 1
        wave += 1

    findings.extend(pending_findings)  # loop never ran (e.g. all seeds blocked)

    if catalog is not None and catalog.last_committed_wave() is not None:
        last = catalog.last_committed_wave()
        fetch_log = catalog.read_deltas_through(spark, "fetch_log", last)
        findings_df = catalog.read_deltas_through(spark, "findings", last)
    else:
        fetch_log = _union_all(fetch_logs, empty_log)
        findings_df = _union_all(findings, empty_findings)
    return CrawlResult(
        fetch_log=fetch_log, findings=findings_df, seen=seen, waves=end_wave,
        metrics=metrics,
    )


def _union_all(dfs: list[DataFrame], empty: DataFrame) -> DataFrame:
    out = empty
    for df in dfs:
        out = out.unionByName(df)
    return out


def _elect(frontier: DataFrame, budgets: DataFrame, cfg: CrawlConfig):
    """Two-phase salted per-netloc top-budget election (W1/W2/J5).

    Exact: any row in a netloc's global top-B is in the top-B of its salt
    bucket, so phase 1 (partitioned by (netloc, salt)) never cuts a winner,
    and phase 2 ranks at most B*salt_buckets rows per netloc.
    """
    fr = frontier.join(budgets, "netloc", "left").withColumn(
        "budget", F.coalesce("budget", F.lit(cfg.budget_per_host))
    )
    fr = fr.withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(cfg.salt_buckets)).cast("int")
    )
    w1 = Window.partitionBy("netloc", "salt").orderBy("priority", "url")
    fr = fr.withColumn("rk1", F.row_number().over(w1))
    surv = fr.filter(F.col("rk1") <= F.col("budget"))
    spill0 = fr.filter(F.col("rk1") > F.col("budget"))
    w2 = Window.partitionBy("netloc").orderBy("priority", "url")
    surv = surv.withColumn("rk2", F.row_number().over(w2))
    elected = surv.filter(F.col("rk2") <= F.col("budget")).drop(
        "budget", "salt", "rk1", "rk2"
    )
    spill1 = surv.filter(F.col("rk2") > F.col("budget"))
    remainder = spill0.drop("budget", "salt", "rk1").unionByName(
        spill1.drop("budget", "salt", "rk1", "rk2")
    )
    return elected, remainder


def _robots_gate(
    spark: SparkSession, df: DataFrame, robots: DataFrame, passthrough: list[str]
) -> DataFrame:
    """Join rules on netloc, evaluate verdicts vectorized per batch."""
    joined = df.join(robots, "netloc", "left").repartition("netloc")
    schema = ", ".join(
        f"{c} {_SPARK_TYPES[c]}" for c in passthrough
    ) + ", robots_allowed boolean"
    cols = [c for c in passthrough]
    return joined.select(*cols, "rules").mapInPandas(_robots_gate_fn(cols), schema)


_SPARK_TYPES = {
    "url": "string",
    "netloc": "string",
    "depth": "int",
    "priority": "double",
    "referrer": "string",
    "url_hash": "long",
    "shard": "int",
}


def _filter_unseen(
    cand: DataFrame, seen: DataFrame, shards: DataFrame | None, cfg: CrawlConfig
) -> DataFrame:
    """A1 + J2: bloom probe first; exact anti-join only for bloom-positives."""
    if shards is None or not cfg.use_bloom:
        return cand.join(seen.select("url"), "url", "left_anti")
    cand_cols = ["url", "netloc", "depth", "priority", "referrer", "url_hash", "shard"]
    probe_schema = (
        ", ".join(f"{c} {_SPARK_TYPES.get(c, 'string')}" for c in cand_cols)
        + ", maybe_seen boolean"
    )
    probed = (
        cand.groupby("shard")
        .cogroup(shards.select("shard", "bits").groupby("shard"))
        .applyInPandas(_make_probe_fn(cand_cols), probe_schema)
    )
    definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = maybe.join(seen.select("url"), "url", "left_anti")
    return definitely_new.unionByName(confirmed_new)


def _merge_shards(
    spark: SparkSession, new_seen: DataFrame, shards: DataFrame | None, cfg: CrawlConfig
) -> DataFrame:
    if shards is None:
        shards = spark.createDataFrame([], _SHARDS_SCHEMA)
    merged = (
        new_seen.select("shard", "url_hash")
        .groupby("shard")
        .cogroup(shards.groupby("shard"))
        .applyInPandas(_make_merge_fn(cfg.bloom_bits, cfg.bloom_hashes), _SHARDS_SCHEMA)
    )
    return merged.localCheckpoint(eager=True)


def _run_checkers(parsed: DataFrame, dictionary: DataFrame | None) -> list[DataFrame]:
    out = []
    if dictionary is not None:
        out.append(
            check_spelling(parsed, dictionary).select(
                F.lit("spelling").alias("module"), "url", "wave",
                F.col("word").alias("detail"), F.lit("").alias("referrer"),
            )
        )
    out.append(
        check_regex(parsed).select(
            F.lit("regex").alias("module"), "url", "wave",
            F.col("match").alias("detail"), F.lit("").alias("referrer"),
        )
    )
    out.append(
        check_comments(parsed).select(
            F.lit("comments").alias("module"), "url", "wave",
            F.col("comment").alias("detail"), F.lit("").alias("referrer"),
        )
    )
    out.append(
        check_metadata(parsed).select(
            F.lit("metadata").alias("module"), "url", "wave",
            F.col("issue").alias("detail"), F.lit("").alias("referrer"),
        )
    )
    return out
