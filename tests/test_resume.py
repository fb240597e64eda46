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


@pytest.fixture(autouse=True)
def _sweep_after_each(spark):
    """This module runs several multi-wave crawls per test; each releases
    its caches, but unpersist is async (ContextCleaner processes on GC).
    Force the GC round-trip per test so one test's released state is gone
    before the next crawl allocates, instead of stacking until the
    module-scope sweep."""
    yield
    import gc

    gc.collect()
    spark.sparkContext._jvm.System.gc()


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


@pytest.fixture(scope="module")
def baseline_run(spark, pages):
    """Uninterrupted-crawl reference, computed ONCE for the module and
    held only as Python summaries (the frames are released immediately):
    several kill/resume tests compare against it, and each extra full
    crawl in this module is real heap pressure on the shared session —
    the round-6 suite hit broadcast-build OOM from exactly that."""
    res = crawl(spark, pages, make_seeds_pdf().url.tolist(), _cfg())
    summary, waves = _summary(res), res.waves
    res.release()
    return summary, waves


def test_kill_and_resume_equals_uninterrupted(spark, pages, tmp_path,
                                              baseline_run):
    base_summary, base_waves = baseline_run
    seeds = make_seeds_pdf().url.tolist()

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
    assert _summary(resumed) == base_summary
    assert resumed.waves == base_waves
    partial.release()
    resumed.release()


def test_kill_and_resume_with_file_uri_checkpoint(spark, pages, tmp_path,
                                                  baseline_run):
    """The commit protocol must run when checkpoint_dir is a Hadoop URI,
    not just a local path: WaveCatalog routes table renames and the
    manifest tmp+rename through the Hadoop FileSystem API for scheme'd
    bases (the read side already did — X20), so a kill/resume cycle
    against file:// must be byte-equal to the uninterrupted run."""
    base_summary, base_waves = baseline_run
    seeds = make_seeds_pdf().url.tolist()

    ckpt = "file://" + str(tmp_path / "ckpt_uri")
    partial = crawl(spark, pages, seeds, _cfg(max_waves=2, checkpoint_dir=ckpt))
    assert WaveCatalog(ckpt, spark).last_committed_wave() == 1
    # manifest really lives behind the URI (written via Hadoop FS)
    assert os.path.exists(str(tmp_path / "ckpt_uri" / "manifest.json"))
    # URI base without a SparkSession must fail loudly, not fall back to os.*
    with pytest.raises(ValueError, match="SparkSession"):
        WaveCatalog(ckpt).read_manifest()

    resumed = crawl(spark, pages, seeds, _cfg(checkpoint_dir=ckpt))
    assert _summary(resumed) == base_summary
    assert resumed.waves == base_waves
    partial.release()
    resumed.release()


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


def test_seen_commits_are_deltas(spark, pages, tmp_path):
    """Per-wave seen checkpoints are O(delta), not O(cumulative): each
    committed seen table holds only that wave's new requests, the deltas
    partition the final seen set, and the manifest records kind + bytes."""
    seeds = make_seeds_pdf().url.tolist()
    ckpt = str(tmp_path / "ckpt_delta")
    res = crawl(spark, pages, seeds, _cfg(checkpoint_dir=ckpt))
    cat = WaveCatalog(ckpt)
    m = cat.read_manifest()
    last = m["committed_wave"]
    assert last >= 2  # need a real delta chain to make the point

    total_rows, seen_urls = 0, set()
    for k in range(last + 1):
        ent = m["waves"][str(k)]["lineage"]["seen"]
        assert ent["kind"] == ("full" if k == 0 else "delta")
        assert ent["bytes"] > 0
        rows = spark.read.parquet(ent["path"]).collect()
        total_rows += len(rows)
        seen_urls |= {(r["verb"], r["url"], r["post_data"]) for r in rows}
    final = {(r["verb"], r["url"], r["post_data"]) for r in res.seen.collect()}
    # disjoint deltas that exactly cover the final seen set
    assert total_rows == len(seen_urls) == len(final)
    assert seen_urls == final
    # and read_state reconstructs the full state at the last wave
    assert cat.read_state(spark, "seen", last).count() == len(final)
    res.release()


def test_seen_compaction_snapshot(spark, pages, tmp_path):
    """seen_compact_every=2: full snapshots at waves 0/2/4, deltas between;
    resume reads snapshot + at most one delta."""
    seeds = make_seeds_pdf().url.tolist()
    ckpt = str(tmp_path / "ckpt_compact")
    baseline = crawl(spark, pages, seeds, _cfg())
    partial = crawl(
        spark, pages, seeds,
        _cfg(max_waves=4, checkpoint_dir=ckpt, seen_compact_every=2),
    )
    m = WaveCatalog(ckpt).read_manifest()
    kinds = {
        k: v["lineage"]["seen"]["kind"] for k, v in m["waves"].items()
    }
    assert kinds == {"0": "full", "1": "delta", "2": "full", "3": "delta"}
    resumed = crawl(
        spark, pages, seeds, _cfg(checkpoint_dir=ckpt, seen_compact_every=2)
    )
    assert _summary(resumed) == _summary(baseline)
    for res in (baseline, partial, resumed):
        res.release()


def _downgrade_checkpoint_to_pre_v3(spark, ckpt, cfg):
    """Rewrite a committed wave-1 checkpoint into pre-contract-v3 shape:
    seen as one row per url with url-only hashes (no verb/post_data),
    shards rebuilt from those stale hashes, POST rows stripped from the
    frontier and fetch-log deltas, identity-config keys dropped from the
    manifest — a checkpoint a pre-v3 engine could actually have written."""
    import shutil

    from pyspark.sql import functions as F

    from sitecheck_spark.crawl import _make_merge_fn, _SHARDS_SCHEMA

    cat = WaveCatalog(ckpt)
    assert cat.last_committed_wave() == 1
    stale_seen = (
        cat.read_state(spark, "seen", 1)
        .select("url").distinct()
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn(
            "shard", F.pmod(F.col("url_hash"), F.lit(cfg.n_shards)).cast("int")
        )
        .localCheckpoint(eager=True)
    )
    stale_shards = (
        stale_seen.select("shard", "url_hash")
        .groupby("shard")
        .cogroup(spark.createDataFrame([], _SHARDS_SCHEMA).groupby("shard"))
        .applyInPandas(_make_merge_fn(cfg), _SHARDS_SCHEMA)
        .localCheckpoint(eager=True)
    )
    m = cat.read_manifest()

    def _rewrite(path, df):
        tmp = path + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(path)
        os.rename(tmp, path)

    # a pre-v3 engine had no POST requests anywhere: strip them from the
    # frontier (and drop its verb/post_data columns) and from the
    # pre-kill fetch-log deltas, so the emulated checkpoint is one a
    # pre-v3 engine could actually have written
    front_path = m["waves"]["1"]["lineage"]["frontier"]["path"]
    stale_frontier = (
        spark.read.parquet(front_path)
        .filter(F.col("verb") == "GET")
        .drop("verb", "post_data")
        .localCheckpoint(eager=True)
    )
    _rewrite(front_path, stale_frontier)
    for k in ("0", "1"):
        log_path = m["waves"][k]["lineage"]["fetch_log_delta"]["path"]
        only_get = (
            spark.read.parquet(log_path)
            .filter(F.col("verb") == "GET")
            .localCheckpoint(eager=True)
        )
        _rewrite(log_path, only_get)
    for name, df in (("seen", stale_seen), ("shards", stale_shards)):
        path = m["waves"]["1"]["lineage"][name]["path"]
        _rewrite(path, df)
        m["waves"]["1"]["lineage"][name]["kind"] = "full"
    # pre-v3 manifests carried no identity-config keys
    for key in ("n_shards", "filter_kind"):
        m["config"].pop(key, None)
    import json as _json

    with open(os.path.join(ckpt, "manifest.json"), "w") as f:
        _json.dump(m, f)


def test_pre_v3_checkpoint_resume_rebuilds_identity_and_shards(
    spark, pages, tmp_path
):
    """ADVICE r3 (high): a pre-contract-v3 checkpoint stores seen with
    url-only hashes and bloom shards built from them. Migrating by
    defaulting verb/post_data while KEEPING those hashes makes every v3
    probe (xxhash64(verb,url,post_data)) a bloom false-negative, silently
    re-enqueueing crawled urls. Resume must recompute identities and
    rebuild shards — no request may ever be fetched twice."""
    from pyspark.sql import functions as F

    seeds = make_seeds_pdf().url.tolist()
    ckpt = str(tmp_path / "ckpt_prev3")
    crawl(
        spark, pages, seeds, _cfg(max_waves=2, checkpoint_dir=ckpt)
    ).release()
    _downgrade_checkpoint_to_pre_v3(spark, ckpt, _cfg())

    resumed = crawl(spark, pages, seeds, _cfg(checkpoint_dir=ckpt))
    log = resumed.fetch_log.collect()
    fetched = [(r["verb"], r["url"], r["post_data"]) for r in log]
    # resume-exactly: every request identity fetched at most once across
    # the pre-kill deltas and the resumed waves
    assert len(fetched) == len(set(fetched))
    # migrated identities are v3 hashes
    bad = resumed.seen.filter(
        F.col("url_hash") != F.xxhash64("verb", "url", "post_data")
    ).count()
    assert bad == 0
    resumed.release()


def test_resume_twice_after_pre_v3_migration(spark, pages, tmp_path):
    """ADVICE r4 (high): migration recomputes seen identity in memory, but
    if the resumed run then commits only deltas the on-disk base stays the
    pre-v3 snapshot (url-only schema, stale hashes). A SECOND resume would
    read_state a mixed-schema base+delta parquet chain without mergeSchema
    — base rows get null verb/post_data or deltas lose POST identity, the
    exact anti-join stops matching, and crawled requests silently re-fetch.
    The first commit after a migration must therefore be a full snapshot,
    making the on-disk chain schema-uniform before any delta lands."""
    from pyspark.sql import functions as F

    seeds = make_seeds_pdf().url.tolist()
    ckpt = str(tmp_path / "ckpt_prev3_twice")
    crawl(spark, pages, seeds, _cfg(max_waves=2, checkpoint_dir=ckpt)).release()
    _downgrade_checkpoint_to_pre_v3(spark, ckpt, _cfg())

    # First resume, killed again after one wave. seen_compact_every=16
    # (the default cadence) would make wave 2 a DELTA commit — the
    # migration must override that and snapshot full.
    crawl(
        spark, pages, seeds,
        _cfg(max_waves=3, checkpoint_dir=ckpt, seen_compact_every=16),
    ).release()
    m = WaveCatalog(ckpt).read_manifest()
    assert m["waves"]["2"]["lineage"]["seen"]["kind"] == "full"
    # and the snapshot on disk is uniformly contract-v3
    snap = spark.read.parquet(m["waves"]["2"]["lineage"]["seen"]["path"])
    assert {"verb", "post_data", "url_hash", "shard"} <= set(snap.columns)

    # Second resume: resume-exactly must still hold end-to-end.
    resumed = crawl(
        spark, pages, seeds, _cfg(checkpoint_dir=ckpt, seen_compact_every=16)
    )
    log = resumed.fetch_log.collect()
    fetched = [(r["verb"], r["url"], r["post_data"]) for r in log]
    assert len(fetched) == len(set(fetched))  # no request fetched twice
    # every identity in seen is a true v3 hash (no nulls, no stale hashes)
    bad = resumed.seen.filter(
        (F.col("url_hash") != F.xxhash64("verb", "url", "post_data"))
        | F.col("verb").isNull() | F.col("post_data").isNull()
    ).count()
    assert bad == 0
    # and nothing fetched (incl. wave-2+ POSTs) lost its seen identity
    seen_ids = {
        (r["verb"], r["url"], r["post_data"]) for r in resumed.seen.collect()
    }
    assert set(fetched) <= seen_ids
    resumed.release()


def test_remote_manifest_recovers_from_tmp_after_crash_window(spark, pages,
                                                              tmp_path):
    """The remote delete+rename fallback has a window where manifest.json
    is deleted but .manifest.tmp (fully written + synced) still holds the
    committed state. read_manifest must recover from the tmp instead of
    reporting a fresh store — otherwise a crash in exactly that window
    silently discards every committed wave."""
    import json
    import shutil

    seeds = make_seeds_pdf().url.tolist()
    ckpt_dir = tmp_path / "ckpt_crashwin"
    ckpt = "file://" + str(ckpt_dir)
    partial = crawl(spark, pages, seeds, _cfg(max_waves=2, checkpoint_dir=ckpt))
    partial.release()
    cat = WaveCatalog(ckpt, spark)
    assert cat.last_committed_wave() == 1

    # emulate the crash window: manifest deleted, tmp (the about-to-be
    # manifest) present and complete
    manifest = ckpt_dir / "manifest.json"
    shutil.copy(manifest, ckpt_dir / ".manifest.tmp")
    manifest.unlink()
    assert WaveCatalog(ckpt, spark).last_committed_wave() == 1

    # a TORN tmp (mid-write crash) must not be trusted
    (ckpt_dir / ".manifest.tmp").write_text('{"committed_wave": 1, "wav')
    assert WaveCatalog(ckpt, spark).read_manifest() is None
