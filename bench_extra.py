"""Round-7 optimization harness (guide §1: measure first; §1.4 noop sink).

NOT the frozen driver bench — bench.py stays the measurement contract.
This file exists to (a) time individual queries in isolation with the noop
sink, (b) dump .explain("formatted") plans to plans/r07/, and (c) break the
crawl into per-wave phase timings, so every optimization in
OPTIMIZATION_r07.md cites a number and a plan.

Usage:
  python bench_extra.py queries  [name ...]   # time + plan per query
  python bench_extra.py plans    [name ...]   # plans only (no timing)
  python bench_extra.py crawl                 # crawl with verbose waves
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS,
     SPARK_GRAFT_RUNS (default 3), SPARK_GRAFT_PLAN_TAG (default 'before').
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import build_spark, HEADLINE  # same session config as the contract

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
PLAN_TAG = os.environ.get("SPARK_GRAFT_PLAN_TAG", "before")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_queries(names: list[str], plans_only: bool = False) -> None:
    from sitecheck_spark.queries import QUERIES

    os.makedirs(PLAN_DIR, exist_ok=True)
    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        fn = QUERIES[name]["fn"]
        df = fn(spark, SF_DIR)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(PLAN_DIR, f"{name}_{PLAN_TAG}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        if plans_only:
            continue
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, SF_DIR).count()
        samples = []
        for i in range(RUNS):
            spark.sparkContext.setJobDescription(f"{name}:{i}")
            t0 = time.time()
            _noop(fn(spark, SF_DIR))
            samples.append(round(time.time() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    if not plans_only:
        print(json.dumps({"sf_dir": SF_DIR, "results": out}))
    spark.stop()


def run_crawl() -> None:
    import bench as b

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    import sitecheck_spark.crawl as crawl_mod
    # patch verbose on via config default: bench_crawl builds its own cfg,
    # so wrap CrawlConfig to force verbose
    orig = crawl_mod.CrawlConfig

    class VerboseCfg(orig):
        def __init__(self, *a, **kw):
            kw["verbose"] = True
            super().__init__(*a, **kw)

    crawl_mod.CrawlConfig = VerboseCfg
    b.CrawlConfig = VerboseCfg  # in case of direct import
    from sitecheck_spark.crawl import CrawlConfig  # noqa
    stats = b.bench_crawl(spark, b.BENCH_PAGES, b.BENCH_WAVES)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    names = sys.argv[2:] or HEADLINE
    if mode == "crawl":
        run_crawl()
    elif mode == "plans":
        run_queries(names, plans_only=True)
    else:
        run_queries(names)
