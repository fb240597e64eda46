"""Checkpoint/resume tests (SURVEY.md §5.5): a crawl killed after wave k and
resumed must produce byte-equal final state to an uninterrupted run."""

from collections import Counter

import os

import pytest

from sitecheck_spark.crawl import CrawlConfig, crawl
from sitecheck_spark.sources.catalog import WaveCatalog
from sitecheck_spark.sources.corpus import make_pages_pdf, make_seeds_pdf

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
N_PAGES, BUDGET, WAVES = 48, 3, 5


def _cfg(**kw):
    base = dict(budget_per_host=BUDGET, max_waves=WAVES, n_shards=4,
                salt_buckets=2, run_checkers=False)
    base.update(kw)
    return CrawlConfig(**base)


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(make_pages_pdf(N_PAGES), schema=PAGES_SCHEMA).cache()


def _summary(res):
    log = Counter(
        (r["wave"], r["url"], r["status"]) for r in res.fetch_log.collect()
    )
    seen = {r["url"] for r in res.seen.collect()}
    return log, seen


def test_kill_and_resume_equals_uninterrupted(spark, pages, tmp_path):
    seeds = make_seeds_pdf().url.tolist()
    baseline = crawl(spark, pages, seeds, _cfg())

    ckpt = str(tmp_path / "ckpt")
    # "killed" after wave 1 (max_waves=2 simulates the kill point)
    partial = crawl(spark, pages, seeds, _cfg(max_waves=2, checkpoint_dir=ckpt))
    assert WaveCatalog(ckpt).last_committed_wave() == 1

    # plant an orphaned uncommitted wave dir (a real kill mid-write)
    orphan = os.path.join(ckpt, "frontier", "wave=9")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "garbage.parquet"), "wb") as f:
        f.write(b"not parquet")

    resumed = crawl(spark, pages, seeds, _cfg(checkpoint_dir=ckpt))
    assert _summary(resumed) == _summary(baseline)
    assert resumed.waves == baseline.waves
    for res in (baseline, partial, resumed):
        res.release()


def test_resume_of_finished_crawl_is_noop(spark, pages, tmp_path):
    seeds = make_seeds_pdf().url.tolist()
    ckpt = str(tmp_path / "ckpt2")
    first = crawl(spark, pages, seeds, _cfg(max_waves=2, checkpoint_dir=ckpt))
    again = crawl(spark, pages, seeds, _cfg(max_waves=2, checkpoint_dir=ckpt))
    assert _summary(again) == _summary(first)
    first.release()
    again.release()


def test_manifest_records_lineage_and_metrics(spark, pages, tmp_path):
    seeds = make_seeds_pdf().url.tolist()
    ckpt = str(tmp_path / "ckpt3")
    crawl(spark, pages, seeds, _cfg(max_waves=2, checkpoint_dir=ckpt)).release()
    m = WaveCatalog(ckpt).read_manifest()
    assert m["committed_wave"] == 1
    for wave in ("0", "1"):
        lin = m["waves"][wave]["lineage"]
        assert {"frontier", "seen", "shards", "fetch_log_delta",
                "findings_delta"} <= set(lin)
        assert all(v["n_files"] >= 1 for v in lin.values())
        assert "n_frontier_next" in m["waves"][wave]["metrics"]
