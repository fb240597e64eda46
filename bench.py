"""Throughput bench (SURVEY.md §6, BASELINE.md).

Runs (a) the crawl engine — the BASELINE.json headline metric is URLs
crawled+validated per second — over a deterministically generated heavy
corpus, and (b) headline operator queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl_urls": N, "crawl_urls_per_sec": X, "cpus": C}

Every timing is BEST-OF-N with all samples recorded (`crawl_sec_runs`,
`query_runs`) — this sandbox's host load fluctuates enough that identical
runs vary up to ~2x (BASELINE.md), so a single sample cannot separate an
engine regression from a loud measurement window; `value` and the
per-query `queries` map report the best sample, the run lists carry the
evidence. (Round-5 lesson: a one-sample -17% crawl delta was unattributable
for exactly this reason.)

Env knobs:
  SPARK_GRAFT_SF_DIR       (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS         (default 32)
  SPARK_GRAFT_BENCH_PAGES  (default 120000)
  SPARK_GRAFT_BENCH_WAVES  (default 4)
  SPARK_GRAFT_BENCH_RUNS   (default 3; samples per crawl and per query)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

HEADLINE = [
    "q_join_orders_customer",
    "q_topk_per_group",
    "q_latest_event_per_user",
    "q_session_windows",
    "q_asof_join",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_dedup_jaccard",
    "q_token_count",
    "q_lang_id",
    "q_ann_cosine",
    "q_pagerank",
    "q_connected_components",
    "q_heavy_hitters",
    "q_redirect_chains",
    "q_repetition_quality",
    "q_pack_sequences",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "120000"))
BENCH_WAVES = int(os.environ.get("SPARK_GRAFT_BENCH_WAVES", "4"))
BENCH_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def build_spark(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sitecheck-spark-bench")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.default.parallelism", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .getOrCreate()
    )


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_crawl(spark: SparkSession, n_pages: int, max_waves: int) -> dict:
    from sitecheck_spark.crawl import CrawlConfig, crawl
    from sitecheck_spark.sources.corpus import (
        HEAVY_PROFILE,
        bench_seeds,
        generate_pages_spark,
        make_dictionary_pdf,
    )

    # Materialize the corpus as a parquet table first — `pages` is a TABLE in
    # the engine contract (Iceberg/Common-Crawl style); generating it inline
    # would re-run the Python generator inside every broadcast/cache miss.
    import tempfile

    corpus_dir = os.environ.get("SPARK_GRAFT_CORPUS_DIR") or tempfile.mkdtemp(
        prefix="sitecheck-bench-corpus-"
    )
    marker = os.path.join(corpus_dir, "_SUCCESS")
    gen_t0 = time.time()
    if not os.path.exists(marker):
        generate_pages_spark(spark, n_pages, seed=42, profile=HEAVY_PROFILE)\
            .write.mode("overwrite").parquet(corpus_dir)
    gen_sec = round(time.time() - gen_t0, 2)
    pages = spark.read.parquet(corpus_dir)
    dictionary = spark.createDataFrame(make_dictionary_pdf())
    seeds = bench_seeds(n_pages, every=500)
    cfg = CrawlConfig(
        budget_per_host=10**9,  # throughput mode: budget never binds
        max_waves=max_waves,
        max_depth=10**6,
        n_shards=2 * CPUS,
        salt_buckets=8,
    )
    runs: list[float] = []
    verb_counts: dict[str, int] = {}
    findings_by_module: dict[str, int] = {}
    waves = 0
    for _ in range(BENCH_RUNS):
        t0 = time.time()
        res = crawl(spark, pages, seeds, cfg, dictionary=dictionary)
        # verb split recorded so corpus growth (contract-v3 POST forms) is
        # separable from engine regression without reading BASELINE.md prose
        verb_counts = {
            r["verb"]: r["n"]
            for r in res.fetch_log.groupBy("verb")
            .agg(F.count("*").alias("n")).collect()
        }
        findings_by_module = {
            r["module"]: r["n"]
            for r in res.findings.groupBy("module")
            .agg(F.count("*").alias("n")).collect()
        }
        runs.append(round(time.time() - t0, 2))
        waves = res.waves
        res.release()  # per-wave checkpoints must not leak into the next run
    n_urls = sum(verb_counts.values())  # deterministic: identical every run
    best = min(runs)
    return {
        "corpus_gen_sec": gen_sec,
        "crawl_sec": best,
        "crawl_sec_runs": runs,
        "crawl_urls": n_urls,
        "crawl_post_requests": verb_counts.get("POST", 0),
        "crawl_findings": sum(findings_by_module.values()),
        "crawl_findings_by_module": findings_by_module,
        "crawl_waves": waves,
        "crawl_urls_per_sec": round(n_urls / best, 1),
    }


def main() -> None:
    from sitecheck_spark.queries import QUERIES

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    crawl_stats = bench_crawl(spark, BENCH_PAGES, BENCH_WAVES)
    timings["crawl"] = crawl_stats["crawl_sec"]

    query_runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = QUERIES[name]["fn"]
        fn(spark, SF_DIR).count()  # warm (plan + IO caches)
        samples = []
        for _ in range(BENCH_RUNS):
            t0 = time.time()
            _materialize(fn(spark, SF_DIR))
            samples.append(round(time.time() - t0, 3))
        query_runs[name] = samples
        timings[name] = min(samples)

    total = round(sum(timings.values()), 2)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "query_runs": query_runs,
                "samples_per_timing": BENCH_RUNS,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "cpus": CPUS,
                **crawl_stats,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
