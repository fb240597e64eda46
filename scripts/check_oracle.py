"""Iteration harness: run every registered query against its DuckDB oracle.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession

from sitecheck_spark.queries import QUERIES
from sitecheck_spark.testing import compare, duck_connection

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = set(sys.argv[2:])

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
con = duck_connection(sf_dir)

fails = []
for name, spec in QUERIES.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        df = spec["fn"](spark, sf_dir)
        if spec["sql"]:
            res = compare(df, con.sql(spec["sql"]))
        else:
            n = df.count()
            res = {"match": n >= 0, "detail": f"rows-only: {n} rows"}
    except Exception as exc:  # noqa: BLE001
        res = {"match": False, "detail": f"EXCEPTION {type(exc).__name__}: {exc}"}
    status = "OK  " if res["match"] else "FAIL"
    print(f"{status} {name:28s} {time.time()-t0:6.1f}s  {res['detail'][:220]}")
    if not res["match"]:
        fails.append(name)

print(f"\n{len(fails)} failures: {fails}")
spark.stop()
sys.exit(1 if fails else 0)
