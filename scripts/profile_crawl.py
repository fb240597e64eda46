"""Round-7 crawl profiling: one bench-shaped crawl run with the UI enabled,
stage aggregates by call-site name (plans/stagemetrics.py) printed at the
end. Not part of the frozen bench contract.

Usage: python scripts/profile_crawl.py [n_pages] [waves]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 120000
WAVES = int(sys.argv[2]) if len(sys.argv) > 2 else 4

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("crawl-profile")
    .config("spark.sql.shuffle.partitions", str(2 * CPUS))
    .config("spark.default.parallelism", str(2 * CPUS))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.retainedStages", "3000")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from sitecheck_spark.crawl import CrawlConfig, crawl
from sitecheck_spark.plans import stagemetrics
from sitecheck_spark.sources.corpus import (
    HEAVY_PROFILE, bench_seeds, generate_pages_spark, make_dictionary_pdf,
)

import tempfile

corpus_dir = os.environ.get("SPARK_GRAFT_CORPUS_DIR") or tempfile.mkdtemp(
    prefix="sitecheck-profile-corpus-")
if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
    generate_pages_spark(spark, N_PAGES, seed=42, profile=HEAVY_PROFILE)\
        .write.mode("overwrite").parquet(corpus_dir)
pages = spark.read.parquet(corpus_dir)
dictionary = spark.createDataFrame(make_dictionary_pdf())
seeds = bench_seeds(N_PAGES, every=500)
cfg = CrawlConfig(budget_per_host=10**9, max_waves=WAVES, max_depth=10**6,
                  n_shards=2 * CPUS, salt_buckets=8, verbose=True,
                  phase_labels=os.environ.get("SPARK_GRAFT_PHASE_LABELS") == "1")

before = stagemetrics.completed_stage_ids(spark)
t0 = time.time()
res = crawl(spark, pages, seeds, cfg, dictionary=dictionary)
n = res.fetch_log.count()
wall = time.time() - t0
rows = stagemetrics.stage_aggregates(spark, exclude_ids=before, top=30)
print(json.dumps({"wall_s": round(wall, 2), "urls": n}))
for r in rows:
    print(f"{r['task_time_ms']/1000.0:9.1f}s task  {r['cpu_time_ms']/1000.0:9.1f}s cpu  "
          f"{r['n_stages']:3d} stages {r['n_tasks']:5d} tasks  "
          f"in={r['input_mb']:.0f}MB sr={r['shuffle_read_mb']:.0f}MB "
          f"sw={r['shuffle_write_mb']:.0f}MB  {r['name'][:80]}")
res.release()
spark.stop()
