"""End-to-end golden-crawl parity (SURVEY.md §5.4).

The Spark engine (crawl.py) must reproduce the single-threaded golden
reference crawler's crawl ordering, final URL-seen set, fetch log and
checker findings exactly, on a deterministic corpus with planted broken
links, robots exclusions, a skew host, cycles, misspellings and sensitive
comments (FIXTURES.md §B).
"""

from collections import Counter

import pytest

from sitecheck_spark.crawl import CrawlConfig, crawl
from sitecheck_spark.golden import golden_crawl
from sitecheck_spark.sources.corpus import (
    DICTIONARY,
    MISSPELLINGS,
    ROBOTS_BODIES,
    make_dictionary_pdf,
    make_pages_pdf,
    make_seeds_pdf,
)

N_PAGES = 60
BUDGET = 3
MAX_WAVES = 6

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


@pytest.fixture(scope="module")
def corpus_pdf():
    return make_pages_pdf(N_PAGES)


@pytest.fixture(scope="module")
def golden(corpus_pdf):
    return golden_crawl(
        [tuple(r) for r in corpus_pdf.itertuples(index=False)],
        make_seeds_pdf().url.tolist(),
        ROBOTS_BODIES,
        set(DICTIONARY),
        budget_per_host=BUDGET,
        max_waves=MAX_WAVES,
    )


@pytest.fixture(scope="module")
def engine(spark, corpus_pdf):
    pages = spark.createDataFrame(corpus_pdf, schema=PAGES_SCHEMA)
    dictionary = spark.createDataFrame(make_dictionary_pdf())
    cfg = CrawlConfig(
        budget_per_host=BUDGET,
        max_waves=MAX_WAVES,
        n_shards=4,
        salt_buckets=2,
    )
    return crawl(spark, pages, make_seeds_pdf().url.tolist(), cfg, dictionary=dictionary)


def test_generator_invariants(corpus_pdf):
    assert not (set(MISSPELLINGS) & set(DICTIONARY))
    # skew host holds ~50% of pages
    hosts = corpus_pdf[~corpus_pdf.url.str.endswith("robots.txt")].url.str.split("/").str[2]
    assert hosts.value_counts().iloc[0] / len(hosts) > 0.4


def test_crawl_order_matches_golden(golden, engine):
    got = [
        (r["wave"], r["priority"], r["url"], r["status"])
        for r in engine.fetch_log.orderBy("wave", "priority", "url").collect()
    ]
    want = [(r["wave"], r["priority"], r["url"], r["status"]) for r in golden.fetch_log]
    assert got == want
    assert len(got) > 10


def test_seen_set_matches_golden(golden, engine):
    got = {r["url"] for r in engine.seen.select("url").collect()}
    assert got == golden.seen


def test_findings_match_golden(golden, engine):
    got = Counter(
        (r["module"], r["url"], r["wave"], r["detail"], r["referrer"])
        for r in engine.findings.collect()
    )
    want = Counter(
        (f["module"], f["url"], f["wave"], f["detail"], f["referrer"])
        for f in golden.findings
    )
    assert got == want


def test_findings_cover_planted_signals(golden):
    modules = Counter(f["module"] for f in golden.findings)
    assert modules["broken_link"] > 0
    assert modules["spelling"] > 0
    assert modules["metadata"] > 0


def test_bloom_and_exact_paths_agree(spark, corpus_pdf, engine):
    pages = spark.createDataFrame(corpus_pdf, schema=PAGES_SCHEMA)
    cfg = CrawlConfig(
        budget_per_host=BUDGET, max_waves=MAX_WAVES, use_bloom=False,
        n_shards=4, salt_buckets=2, run_checkers=False,
    )
    exact = crawl(spark, pages, make_seeds_pdf().url.tolist(), cfg)
    assert {r["url"] for r in exact.seen.collect()} == {
        r["url"] for r in engine.seen.collect()
    }
