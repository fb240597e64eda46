"""Two-parallelism-level scaling evidence (BASELINE.md / BASELINE.json).

The north rule requires URL-throughput scaling efficiency >= 0.8 between N
and 4N executors. No real cluster exists in this sandbox, so the same crawl
job runs at local[N] and local[4N] on the same pre-materialized corpus with
identical seeds/budget/waves; efficiency = (throughput_4N / throughput_N) / 4.

Usage: python scripts/bench_scaling.py [n_pages] [low_cpus] [high_cpus]
Each level runs in its own JVM (spark.master is fixed per SparkContext):
this script re-execs itself per level.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
LOW = int(sys.argv[2]) if len(sys.argv) > 2 else 8
HIGH = int(sys.argv[3]) if len(sys.argv) > 3 else 32
WAVES = int(os.environ.get("SPARK_GRAFT_BENCH_WAVES", "4"))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
CORPUS = os.environ.get("SPARK_GRAFT_CORPUS_DIR", f"/tmp/sitecheck-scaling-{N_PAGES}")


def run_level(cpus: int) -> dict:
    from pyspark.sql import SparkSession

    from sitecheck_spark.crawl import CrawlConfig, crawl
    from sitecheck_spark.sources.corpus import (
        HEAVY_PROFILE,
        bench_seeds,
        generate_pages_spark,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"sitecheck-scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseG1GC")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        generate_pages_spark(spark, N_PAGES, seed=42, profile=HEAVY_PROFILE).write.mode(
            "overwrite"
        ).parquet(CORPUS)
    pages = spark.read.parquet(CORPUS)
    seeds = bench_seeds(N_PAGES, every=500)

    def one_run() -> tuple[float, int]:
        cfg = CrawlConfig(
            budget_per_host=10**9, max_waves=WAVES, max_depth=10**6,
            n_shards=2 * cpus, salt_buckets=8, run_checkers=True,
        )
        t0 = time.time()
        res = crawl(spark, pages, seeds, cfg)
        n_urls = res.fetch_log.count()
        n_findings = res.findings.count()
        return time.time() - t0, n_urls, n_findings

    one_run()  # warmup (JIT + python workers), discarded
    samples = [one_run() for _ in range(RUNS)]
    samples.sort(key=lambda s: s[0])
    median = samples[RUNS // 2]
    out = {
        "cpus": cpus,
        "n_pages": N_PAGES,
        "waves": WAVES,
        "urls": median[1],
        "findings": median[2],
        "sec_runs": [round(s[0], 2) for s in samples],
        "sec_median": round(median[0], 2),
        "urls_per_sec": round(median[1] / median[0], 1),
    }
    spark.stop()
    return out


if __name__ == "__main__" and os.environ.get("_SCALING_LEVEL"):
    print(json.dumps(run_level(int(os.environ["_SCALING_LEVEL"]))))
elif __name__ == "__main__":
    results = {}
    for cpus in (LOW, HIGH):
        env = dict(os.environ, _SCALING_LEVEL=str(cpus))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
            env=env, capture_output=True, text=True,
        )
        line = proc.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
        print(json.dumps(results[cpus]))
    eff = (
        results[HIGH]["urls_per_sec"] / results[LOW]["urls_per_sec"]
    ) / (HIGH / LOW)
    summary = {
        "low": results[LOW], "high": results[HIGH],
        "speedup": round(results[HIGH]["urls_per_sec"] / results[LOW]["urls_per_sec"], 2),
        "cluster_ratio": HIGH / LOW,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))
