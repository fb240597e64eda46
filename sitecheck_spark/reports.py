"""Per-module report sinks (SURVEY.md §2.1 S3).

The reference writes one text report per checker module into an output
directory at crawl end. Here each module's findings land as a parquet table
(partitioned by module for pruning) plus a small human-readable summary —
the part a person reads stays small, the data stays columnar.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sitecheck_spark.crawl import CrawlResult


def write_reports(res: CrawlResult, out_dir: str) -> dict:
    """Write findings/<module>/ parquet + fetch_log + summary.txt.

    Returns the summary counts dict.
    """
    os.makedirs(out_dir, exist_ok=True)
    (
        res.findings.repartition("module")
        .write.mode("overwrite")
        .partitionBy("module")
        .parquet(os.path.join(out_dir, "findings"))
    )
    res.fetch_log.write.mode("overwrite").parquet(os.path.join(out_dir, "fetch_log"))

    counts = {
        r["module"]: r["n"]
        for r in res.findings.groupBy("module").agg(F.count("*").alias("n")).collect()
    }
    statuses = {
        r["status"]: r["n"]
        for r in res.fetch_log.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    lines = ["sitecheck-spark crawl report", "=" * 30, "", "fetches by status:"]
    for status in sorted(statuses):
        lines.append(f"  {status}: {statuses[status]}")
    lines.append("")
    lines.append("findings by module:")
    for module in sorted(counts):
        lines.append(f"  {module}: {counts[module]}")
    lines.append("")
    lines.append(f"waves: {res.waves}")
    with open(os.path.join(out_dir, "summary.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return {"statuses": statuses, "findings": counts}
