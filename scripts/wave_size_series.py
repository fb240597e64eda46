"""Merge the paired-protocol summaries at each corpus size into ONE series
artifact: efficiency vs wave size (BENCH/wave_size_series_r5.json).

The north rule's 10^10-URL frontier implies waves of millions of URLs; this
series is the sandbox evidence that paired N/4N efficiency rises with the
work per wave (per-wave fixed overhead amortizes), measured with zero
engine changes across the points.

Usage: python scripts/wave_size_series.py out.json summary1.json [summary2 ...]
Each input is a JSONL file whose LAST line is a paired-protocol summary
(scripts/bench_scaling.py output). Summaries for the same n_pages are
pooled (their pairs concatenated).
"""

from __future__ import annotations

import json
import statistics
import sys


def last_summary(path: str) -> dict:
    with open(path) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    d = json.loads(lines[-1])
    if d.get("protocol") != "paired":
        raise SystemExit(f"{path}: not a paired-protocol summary")
    return d


def main() -> None:
    out_path, inputs = sys.argv[1], sys.argv[2:]
    by_pages: dict[int, dict] = {}
    for path in inputs:
        d = last_summary(path)
        n = d["n_pages"]
        cur = by_pages.setdefault(
            n,
            {"n_pages": n, "waves": d["waves"], "urls": d["urls"],
             "pair_efficiencies": [], "low_sec_runs": [],
             "high_sec_runs": [], "sources": []},
        )
        cur["pair_efficiencies"] += d["pair_efficiencies"]
        cur["low_sec_runs"] += d["low_sec_runs"]
        cur["high_sec_runs"] += d["high_sec_runs"]
        cur["sources"].append(path)
    series = []
    for n in sorted(by_pages):
        c = by_pages[n]
        effs = sorted(c["pair_efficiencies"])
        series.append({
            **c,
            "pair_efficiencies": effs,
            "efficiency_median_pair": round(statistics.median(effs), 3),
            "efficiency_best_pair": max(effs),
            "efficiency_worst_pair": min(effs),
            "urls_per_wave_approx": round(c["urls"] / c["waves"]),
            "high_urls_per_sec_best": round(
                c["urls"] / min(c["high_sec_runs"]), 1),
            "low_urls_per_sec_best": round(
                c["urls"] / min(c["low_sec_runs"]), 1),
        })
    doc = {
        "metric": "paired N/4N scaling efficiency vs corpus (wave) size",
        "protocol": "paired interleaved, bucketed TABLE fetch, 3 waves",
        "series": series,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    for p in series:
        print(p["n_pages"], "median", p["efficiency_median_pair"],
              "best", p["efficiency_best_pair"],
              "worst", p["efficiency_worst_pair"],
              "pairs", len(p["pair_efficiencies"]))


if __name__ == "__main__":
    main()
