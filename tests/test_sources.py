"""Custom Python DataSource (S5) + report sinks (S3) tests."""

import os

import pytest

from sitecheck_spark.sources.corpus import make_pages_pdf
from sitecheck_spark.sources.pages_source import SyntheticPagesDataSource


def test_synthetic_pages_datasource_matches_generator(spark):
    spark.dataSource.register(SyntheticPagesDataSource)
    df = (
        spark.read.format("synthetic_pages")
        .option("n_pages", 40).option("seed", 42).option("partitions", 3)
        .load()
    )
    got = {(r["url"], str(r["warc_ts"])[:19], r["text"], r["lang"]) for r in df.collect()}
    pdf = make_pages_pdf(40, seed=42)
    want = {(u, str(t)[:19], x, l) for u, t, _h, x, l in
            zip(pdf.url, pdf.warc_ts, pdf.html, pdf.text, pdf.lang)}
    assert got == want


def test_datasource_partition_count_does_not_change_data(spark):
    spark.dataSource.register(SyntheticPagesDataSource)
    def load(parts):
        return (
            spark.read.format("synthetic_pages")
            .option("n_pages", 30).option("partitions", parts).load()
        )
    a = {r["url"] + str(r["warc_ts"]) for r in load(1).collect()}
    b = {r["url"] + str(r["warc_ts"]) for r in load(7).collect()}
    assert a == b


def test_write_reports(spark, tmp_path):
    from sitecheck_spark.crawl import CrawlConfig, crawl
    from sitecheck_spark.reports import write_reports
    from sitecheck_spark.sources.corpus import make_dictionary_pdf, make_seeds_pdf

    pages = spark.createDataFrame(
        make_pages_pdf(24),
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    res = crawl(
        spark, pages, make_seeds_pdf().url.tolist(),
        CrawlConfig(budget_per_host=3, max_waves=3, n_shards=4, salt_buckets=2),
        dictionary=spark.createDataFrame(make_dictionary_pdf()),
    )
    out = str(tmp_path / "reports")
    summary = write_reports(res, out)
    assert os.path.exists(os.path.join(out, "summary.txt"))
    assert summary["statuses"].get(200, 0) > 0
    assert summary["findings"]
    back = spark.read.parquet(os.path.join(out, "findings"))
    assert back.count() == res.findings.count()
    assert "module" in back.columns  # partition column round-trips
    res.release()  # cached wave state must not leak into later tests
