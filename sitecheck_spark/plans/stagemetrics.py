"""Per-stage metrics via the Spark UI REST API (SURVEY.md §6 / BASELINE.md).

The scaling protocol needs to show WHICH stages scale between N and 4N
executors and which hit a shared-host resource. PySpark has no ergonomic
SparkListener hook (py4j callback server is fragile under local-cluster), so
this reads the same data the UI renders: /api/v1/applications/<id>/stages.

Stages are aggregated BY NAME (the call site, e.g. "mapInPandas at
crawl.py:519") — stage IDs differ across runs/levels but the name identifies
the logical operator, so per-name aggregates can be joined across
parallelism levels to localize anti-scaling.

Requires spark.ui.enabled=true on the session (the bench scripts flip it on
when stage metrics are requested).
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import SparkSession


def _api(spark: SparkSession, path: str):
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise RuntimeError("Spark UI disabled — set spark.ui.enabled=true "
                           "to collect stage metrics")
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}",
                                timeout=30) as r:
        return json.loads(r.read().decode())


def completed_stage_ids(spark: SparkSession) -> set[int]:
    """Snapshot of completed stage ids — take one before a run so the run's
    own stages can be isolated afterwards."""
    return {s["stageId"] for s in _api(spark, "/stages?status=complete")}


def stage_aggregates(
    spark: SparkSession, exclude_ids: set[int] | None = None,
    top: int | None = None,
) -> list[dict]:
    """Completed stages aggregated by name, heaviest task-time first.

    taskTime (executorRunTime) is the contention-sensitive signal: under
    perfect scaling it stays flat across cluster sizes while wall time
    divides by the size ratio; inflation at the bigger cluster localizes a
    contended resource to the stages that touch it.
    """
    by_name: dict[str, dict] = {}
    for s in _api(spark, "/stages?status=complete"):
        if exclude_ids and s["stageId"] in exclude_ids:
            continue
        a = by_name.setdefault(s["name"], {
            "name": s["name"], "n_stages": 0, "task_time_ms": 0,
            "cpu_time_ms": 0, "input_mb": 0.0, "shuffle_read_mb": 0.0,
            "shuffle_write_mb": 0.0, "n_tasks": 0,
        })
        a["n_stages"] += 1
        a["task_time_ms"] += s.get("executorRunTime", 0)
        a["cpu_time_ms"] += s.get("executorCpuTime", 0) // 1_000_000
        a["input_mb"] += s.get("inputBytes", 0) / 2**20
        a["shuffle_read_mb"] += s.get("shuffleReadBytes", 0) / 2**20
        a["shuffle_write_mb"] += s.get("shuffleWriteBytes", 0) / 2**20
        a["n_tasks"] += s.get("numCompleteTasks", 0)
    out = sorted(by_name.values(), key=lambda a: -a["task_time_ms"])
    for a in out:
        for k in ("input_mb", "shuffle_read_mb", "shuffle_write_mb"):
            a[k] = round(a[k], 1)
    return out[:top] if top else out


def merge_levels(low: list[dict], high: list[dict],
                 low_label: str = "N", high_label: str = "4N") -> list[dict]:
    """Join two levels' stage_aggregates by stage name; inflation =
    high task-time / low task-time (1.0 = contention-free)."""
    idx = {a["name"]: a for a in low}
    rows = []
    for h in high:
        l = idx.get(h["name"])
        if not l or l["task_time_ms"] == 0:
            continue
        rows.append({
            "name": h["name"],
            f"task_time_s_{low_label}": round(l["task_time_ms"] / 1000, 1),
            f"task_time_s_{high_label}": round(h["task_time_ms"] / 1000, 1),
            "inflation": round(h["task_time_ms"] / l["task_time_ms"], 2),
            "shuffle_write_mb": h["shuffle_write_mb"],
            "input_mb": h["input_mb"],
        })
    rows.sort(key=lambda r: -r[f"task_time_s_{high_label}"])
    return rows
