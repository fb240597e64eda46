"""Host-calibration NULL benchmark for the scaling criterion (BASELINE.md).

The north rule's scaling-efficiency bar (>=0.8 between N and 4N executors)
is measured in this sandbox by running both "clusters" on ONE shared host.
That host imposes its own ceiling on ANY 4x-parallelism ratio — background
load, one memory bus, one disk, one page cache — independent of the engine
under test. This script measures that ceiling with two perfectly-parallel
null workloads run through the exact same paired local-cluster protocol as
`scripts/bench_scaling.py`:

- cpu: pure-JVM codegen compute over `spark.range` — zero input, zero
  shuffle, zero Python. Any efficiency loss here is host scheduling/clock
  noise, not data movement. This bounds what a CPU-bound stage can show.
- scan: full-corpus parquet scan + aggregate over the SAME zstd corpus the
  scaling bench crawls (page-cached after the warmup) — decompress on the
  executor cores, bytes over the one shared memory bus. Zero Python, zero
  shuffle beyond the final partial-agg exchange (~KB). This bounds what any
  corpus-scanning stage (the crawl's `wave_chain`) can show on this host.

A null efficiency E_null < 1 means the host itself cannot express a 4x
speedup for that resource profile; engine efficiencies should be read
against E_null, not against 1.0.

Usage: python scripts/bench_null.py [low_cpus] [high_cpus]
Env: SPARK_GRAFT_PAIRS (default 3), SPARK_GRAFT_EXEC_MEM_MB (default 6144),
     SPARK_GRAFT_NULL_CPU_ROWS (default 7.2e9, ~60 s at 4 cores),
     SPARK_GRAFT_NULL_SCANS (default 2 scans per measured run),
     SPARK_GRAFT_CORPUS_DIR.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOW = int(sys.argv[1]) if len(sys.argv) > 1 else 4
HIGH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
PAIRS = int(os.environ.get("SPARK_GRAFT_PAIRS", "3"))
CPU_ROWS = int(float(os.environ.get("SPARK_GRAFT_NULL_CPU_ROWS", "7.2e9")))
SCANS = int(os.environ.get("SPARK_GRAFT_NULL_SCANS", "2"))
# Default to the corpus the scaling bench itself crawls, so the scan null
# exercises the identical bytes/codec the engine's wave_chain reads.
CORPUS = os.environ.get(
    "SPARK_GRAFT_CORPUS_DIR",
    "/tmp/sitecheck-scaling-600000-xheavy-zstd-btable",
)


def run_level(cpus: int, workload: str) -> dict:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    mem_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "6144"))
    n_workers = max(1, cpus // 4)
    master = f"local-cluster[{n_workers},4,{mem_mb}]"
    os.environ.setdefault(
        "SPARK_HOME", os.path.dirname(__import__("pyspark").__file__)
    )
    spark = (
        SparkSession.builder.master(master)
        .appName(f"sitecheck-null-{workload}-{cpus}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", f"{mem_mb}m")
        .config("spark.driver.extraJavaOptions", "-XX:+UseG1GC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseG1GC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if workload == "cpu":
        # 8-deep xxhash64 chain per row: whole-stage-codegen'd JVM compute,
        # no input, no shuffle (partial sums + one ~KB exchange).
        def job():
            col = F.col("id")
            for _ in range(8):
                col = F.xxhash64(col)
            # fold to 16 bits before summing: ANSI mode overflows a raw
            # sum of 64-bit hashes; the check value stays deterministic
            return (
                spark.range(CPU_ROWS, numPartitions=cpus * 4)
                .select(F.sum(col.bitwiseAND(F.lit(65535))).alias("s"))
                .collect()[0]["s"]
            )
    elif workload == "scan":
        if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
            raise SystemExit(
                f"corpus {CORPUS} missing — run scripts/bench_scaling.py "
                "once (it materializes the corpus) or set "
                "SPARK_GRAFT_CORPUS_DIR"
            )
        pages = spark.read.parquet(CORPUS)

        def job():
            tot = 0
            for _ in range(SCANS):
                tot = pages.select(
                    F.sum(F.length("html") + F.length("text")).alias("s")
                ).collect()[0]["s"]
            return tot
    elif workload == "pandas":
        # Arrow→pandas concurrency null: stream the IDENTICAL corpus bytes
        # through mapInPandas with a trivial per-batch body — the full
        # JVM→Arrow→python-worker pipe and python object materialization at
        # `cpus` concurrent workers, none of the engine's parse logic. This
        # bounds what ANY vectorized-python stage can show on this host;
        # compare against the `scan` null (same bytes, JVM-only) to isolate
        # the python-worker path from plain parquet+decompress.
        if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
            raise SystemExit(f"corpus {CORPUS} missing")
        pages = spark.read.parquet(CORPUS)

        def _null_batches(batches):
            import pandas as pd  # noqa: PLC0415

            for pdf in batches:
                yield pd.DataFrame(
                    {"n": pdf["html"].str.len() + pdf["text"].str.len()}
                )

        def job():
            return (
                pages.select("html", "text")
                .mapInPandas(_null_batches, "n bigint")
                .agg(F.sum("n").alias("s"))
                .collect()[0]["s"]
            )
    else:
        raise SystemExit(f"unknown workload {workload!r}")

    job()  # warmup: JIT + executor spin-up + page cache for the scan null
    t0 = time.time()
    check = job()
    elapsed = time.time() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "workload": workload,
        "sec": round(elapsed, 2),
        "check": check,
        "rows": CPU_ROWS if workload == "cpu" else None,
        "scans": SCANS if workload == "scan" else None,
        "corpus": CORPUS if workload == "scan" else None,
    }


def _spawn(cpus: int, workload: str) -> dict:
    env = dict(os.environ, _NULL_LEVEL=str(cpus), _NULL_WORKLOAD=workload)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
        env=env, capture_output=True, text=True,
    )
    lines = proc.stdout.strip().splitlines()
    if not lines or not lines[-1].startswith("{"):
        print(f"--- null {workload}@{cpus} child failed "
              f"(rc={proc.returncode}) ---", file=sys.stderr)
        print(proc.stdout[-4000:], file=sys.stderr)
        print(proc.stderr[-4000:], file=sys.stderr)
        raise SystemExit(1)
    return json.loads(lines[-1])


def main() -> None:
    ratio = HIGH / LOW
    out: dict = {"protocol": "paired-null", "pairs": PAIRS,
                 "cluster_ratio": ratio, "workloads": {}}
    sel = os.environ.get("SPARK_GRAFT_NULL_WORKLOADS", "cpu,scan")
    for workload in [w.strip() for w in sel.split(",") if w.strip()]:
        pairs = []
        for i in range(PAIRS):
            low = _spawn(LOW, workload)
            high = _spawn(HIGH, workload)
            if low["check"] != high["check"]:
                raise SystemExit(
                    f"null {workload} results differ across levels: "
                    f"{low['check']} vs {high['check']}"
                )
            eff = round((low["sec"] / high["sec"]) / ratio, 3)
            pairs.append({"pair": i, "low_sec": low["sec"],
                          "high_sec": high["sec"], "efficiency": eff})
            print(json.dumps({"workload": workload, **pairs[-1]}))
        effs = [p["efficiency"] for p in pairs]
        out["workloads"][workload] = {
            "pair_efficiencies": effs,
            "efficiency_best_pair": max(effs),
            "efficiency_worst_pair": min(effs),
            "efficiency_median_pair": round(statistics.median(effs), 3),
            "low_sec_runs": sorted(p["low_sec"] for p in pairs),
            "high_sec_runs": sorted(p["high_sec"] for p in pairs),
            "pair_details": pairs,
        }
        if workload == "cpu":
            out["workloads"][workload]["rows"] = CPU_ROWS
        elif workload == "scan":
            out["workloads"][workload]["scans"] = SCANS
            out["workloads"][workload]["corpus"] = CORPUS
        else:
            out["workloads"][workload]["corpus"] = CORPUS
    print(json.dumps(out))


if __name__ == "__main__" and os.environ.get("_NULL_LEVEL"):
    print(json.dumps(run_level(
        int(os.environ["_NULL_LEVEL"]), os.environ["_NULL_WORKLOAD"]
    )))
elif __name__ == "__main__":
    main()
