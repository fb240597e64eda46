"""Engine with filter_kind='cuckoo': identical crawl results, deletable seen
set (forget_urls -> re-crawl), saturation degrades to exact checks only."""

import numpy as np
import pytest

from sitecheck_spark.crawl import CrawlConfig, crawl, forget_urls
from sitecheck_spark.seen import CuckooShard
from sitecheck_spark.sources.corpus import make_pages_pdf, make_seeds_pdf

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(make_pages_pdf(48), schema=PAGES_SCHEMA).cache()


def _cfg(**kw):
    base = dict(budget_per_host=3, max_waves=5, n_shards=4, salt_buckets=2,
                run_checkers=False)
    base.update(kw)
    return CrawlConfig(**base)


def test_cuckoo_crawl_equals_bloom_crawl(spark, pages):
    seeds = make_seeds_pdf().url.tolist()
    bloom = crawl(spark, pages, seeds, _cfg(filter_kind="bloom"))
    cuckoo = crawl(spark, pages, seeds, _cfg(filter_kind="cuckoo"))
    key = lambda res: sorted(
        (r["wave"], r["url"], r["status"]) for r in res.fetch_log.collect()
    )
    assert key(bloom) == key(cuckoo)
    assert {r["url"] for r in bloom.seen.collect()} == {
        r["url"] for r in cuckoo.seen.collect()
    }
    bloom.release()
    cuckoo.release()


def _retained_never_forgotten(seen2, shards2):
    """Zero false negatives after forget: every retained seen url must still
    probe positive in its rebuilt shard (the soundness property the old
    cuckoo delete() violated on 16-bit fingerprint collisions)."""
    from sitecheck_spark.crawl import _filter_from_bytes

    by_shard = {r["shard"]: bytes(r["bits"]) for r in shards2.collect()}
    for r in seen2.collect():
        filt = _filter_from_bytes(by_shard[r["shard"]])
        assert filt.contains([r["url_hash"]]).all(), r["url"]


def test_forget_urls_enables_recrawl(spark, pages):
    seeds = make_seeds_pdf().url.tolist()
    cfg = _cfg(filter_kind="cuckoo")
    res = crawl(spark, pages, seeds, cfg)
    victim = sorted(r["url"] for r in res.seen.collect())[0]
    # shards live inside the result's seen pipeline; rebuild from a crawl with
    # checkpointing to get them is overkill — exercise the API directly:
    from sitecheck_spark.crawl import _merge_shards, _with_identity

    shards = _merge_shards(spark, res.seen, None, cfg)
    seen2, shards2 = forget_urls(res.seen, shards, [victim], cfg)
    assert seen2.filter(seen2.url == victim).count() == 0
    assert res.seen.filter(res.seen.url == victim).count() == 1
    assert shards2.count() == shards.count()
    _retained_never_forgotten(seen2, shards2)
    res.release()


def test_forget_on_bloom_rebuilds(spark, pages):
    """Bloom filters cannot delete — forget_urls rebuilds the affected shard
    from the exact seen set instead, so bloom crawls are forgettable too."""
    seeds = make_seeds_pdf().url.tolist()
    cfg = _cfg(filter_kind="bloom")
    res = crawl(spark, pages, seeds, cfg)
    from sitecheck_spark.crawl import _merge_shards

    shards = _merge_shards(spark, res.seen, None, cfg)
    victim = sorted(r["url"] for r in res.seen.collect())[0]
    seen2, shards2 = forget_urls(res.seen, shards, [victim], cfg)
    assert seen2.filter(seen2.url == victim).count() == 0
    assert shards2.count() == shards.count()
    _retained_never_forgotten(seen2, shards2)
    res.release()


def test_cuckoo_saturation_never_false_negative():
    c = CuckooShard(16)  # tiny: 64 slots
    rng = np.random.default_rng(1)
    items = rng.integers(-(2**63), 2**63 - 1, 500, dtype=np.int64)
    c.insert(items)
    assert c.saturated
    assert c.contains(items).all()  # saturated -> all-True, never a false negative
    rt = CuckooShard.from_bytes(c.to_bytes())
    assert rt.saturated
