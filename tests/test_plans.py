"""Physical-plan tests (SURVEY.md §4): assert the optimizations the engine
relies on actually materialize in Catalyst's plans."""

import tempfile

import pytest

from pyspark.sql import functions as F

from sitecheck_spark.plans.checks import (
    assert_broadcast_join,
    assert_column_never_scanned,
    assert_filter_pushed,
    count_shuffles,
    formatted_plan,
    scan_read_schemas,
)
from sitecheck_spark.sources.corpus import make_pages_pdf

from conftest import SF_DIR

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


@pytest.fixture(scope="module")
def pages_parquet(spark):
    d = tempfile.mkdtemp() + "/pages"
    spark.createDataFrame(make_pages_pdf(60), PAGES_SCHEMA).write.parquet(d)
    return d


def test_html_pruned_from_link_count_scan(spark, pages_parquet):
    """The single biggest I/O lever at 10^10 scale: html:binary must never be
    read except into the parse pass (SURVEY.md §4)."""
    pages = spark.read.parquet(pages_parquet)
    q = pages.groupBy("lang").agg(F.count("*").alias("n"))
    assert_column_never_scanned(q, "html")
    q2 = pages.select("url", "warc_ts").filter(F.col("url").startswith("https://big"))
    assert_column_never_scanned(q2, "html")
    assert_column_never_scanned(q2, "text")


def test_lang_filter_pushed_to_parquet(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    q = pages.filter(F.col("lang") == "en").select("url")
    assert_filter_pushed(q, "lang")


def test_broadcast_join_for_small_dims(spark):
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    q = customer.join(F.broadcast(nation),
                      customer.c_nationkey == nation.n_nationkey).groupBy(
        "n_name").count()
    assert_broadcast_join(q)


def test_fetch_join_scans_only_needed_columns(spark, pages_parquet):
    """The crawl's fetch join must not read `text`/`lang` (it parses html)."""
    pages = spark.read.parquet(pages_parquet)
    elected = spark.createDataFrame([("https://big.example.com/p/0.html",)], "url string")
    matched = pages.select("url", "warc_ts", "html").join(F.broadcast(elected), "url")
    latest = matched.groupBy("url").agg(F.max_by("html", "warc_ts").alias("html"))
    for schema in scan_read_schemas(latest):
        assert "text:" not in schema and "lang:" not in schema
    assert_broadcast_join(latest)


def test_bucketed_fetch_join_prunes_partitions(spark):
    """write_pages_bucketed layout: the fetch join keyed on (url_bucket, url)
    must plan a dynamic-partition-pruning filter on the pages scan — only
    the directories holding elected urls get read."""
    import tempfile

    from sitecheck_spark.sources.catalog import (
        PAGES_BUCKET_COL,
        bucket_of,
        read_pages_bucketed,
        write_pages_bucketed,
    )

    d = tempfile.mkdtemp() + "/pages_bucketed"
    src = spark.createDataFrame(make_pages_pdf(60), PAGES_SCHEMA)
    write_pages_bucketed(src, d, n_buckets=8)
    pages, n_buckets = read_pages_bucketed(spark, d)
    assert n_buckets == 8

    # the engine's elected set always carries selective filters (politeness
    # rank / fast-path predicates) — DPP requires one on the filtering side
    elected = (
        spark.createDataFrame(
            [("https://big.example.com/p/0.html", 0)], "url string, depth int"
        )
        .filter(F.col("depth") <= 5)
        .select("url")
        .withColumn(PAGES_BUCKET_COL, bucket_of(F.col("url"), 8))
    )
    matched = pages.select("url", "warc_ts", "html", PAGES_BUCKET_COL).join(
        F.broadcast(elected), [PAGES_BUCKET_COL, "url"]
    )
    plan = formatted_plan(matched)
    assert "dynamicpruning" in plan.lower(), plan


def test_bucketed_crawl_equals_plain_crawl(spark):
    """End-to-end: the bucket-pruned fetch path must produce the identical
    crawl (same fetch log, same seen set) as the plain path."""
    import tempfile

    from sitecheck_spark.crawl import CrawlConfig, crawl
    from sitecheck_spark.sources.catalog import read_pages_bucketed, write_pages_bucketed
    from sitecheck_spark.sources.corpus import make_seeds_pdf

    src = spark.createDataFrame(make_pages_pdf(60), PAGES_SCHEMA)
    d = tempfile.mkdtemp() + "/pages_bucketed_e2e"
    write_pages_bucketed(src, d, n_buckets=8)
    bucketed, n_buckets = read_pages_bucketed(spark, d)

    seeds = make_seeds_pdf().url.tolist()
    base = dict(budget_per_host=3, max_waves=4, n_shards=4, salt_buckets=2,
                run_checkers=False)
    plain = crawl(spark, src, seeds, CrawlConfig(**base))
    pruned = crawl(spark, bucketed, seeds, CrawlConfig(**base, pages_buckets=n_buckets))
    key = lambda res: sorted(
        (r["wave"], r["url"], r["status"]) for r in res.fetch_log.collect()
    )
    assert key(plain) == key(pruned)
    assert {r["url"] for r in plain.seen.collect()} == {
        r["url"] for r in pruned.seen.collect()
    }
    # wrong modulus must be caught, not silently 404
    with pytest.raises(ValueError, match="pages_buckets"):
        crawl(spark, bucketed, seeds, CrawlConfig(**base, pages_buckets=7))
    plain.release()
    pruned.release()


def test_html_crosses_exactly_one_shuffle_per_wave(spark, pages_parquet):
    """The 100-TB contract of the wave chain (crawl.py fetch→dedup→parse):
    html:binary — the dominant bytes of the job — must cross exactly ONE
    shuffle exchange per wave. The repartition(n_parse, url) before the
    version-dedup agg is that one exchange; the agg reuses its partitioning,
    the elected-side left join shuffles only slim frontier columns, and the
    parse pass inherits the partitions. Mirrors the engine chain at
    crawl.py (matched → latest_rows → fetched → parsed)."""
    from sitecheck_spark.plans.checks import shuffle_exchanges_carrying

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # Represent the at-scale plan: latest_rows is far above any broadcast
    # threshold at 100 TB, so disable size-based broadcast; the elected
    # side keeps its explicit broadcast() hint exactly as the engine does.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pages = spark.read.parquet(pages_parquet).select("url", "warc_ts", "html")
        elected = spark.createDataFrame(
            [("https://big.example.com/p/0.html", "big.example.com", 0, 0.0,
              None, 0)],
            "url string, netloc string, depth int, priority double, "
            "referrer string, redirects int",
        )
        matched = pages.join(F.broadcast(elected.select("url")), "url")
        latest_rows = matched.repartition(8, "url").groupBy("url").agg(
            F.max_by("html", F.struct("warc_ts", F.md5("html"))).alias("html")
        )
        fetched = elected.join(latest_rows, "url", "left")
        parsed_input = fetched.filter(F.col("html").isNotNull()).select(
            "url", "netloc", "depth", "priority", "referrer", "redirects", "html"
        )
        carrying = shuffle_exchanges_carrying(parsed_input, "html")
        assert len(carrying) == 1, formatted_plan(parsed_input)
        # and the one exchange is the url-hash repartition, so the dedup agg
        # and the parse stage are co-partitioned with it
        assert "hashpartitioning(url" in carrying[0], carrying[0]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_html_single_shuffle_bucketed_shuffle_fetch(spark):
    """Same single-html-shuffle contract for the bucketed SHUFFLE fetch path
    (the at-scale configuration — a 10^10-URL elected set cannot broadcast):
    the join's Ensure-exchange of the pages side is the ONE html shuffle
    (landing in the elected side's pre-partitioning), the version-dedup agg
    on the join keys reuses it, the elected left join re-derives the bucket
    and shuffles only slim columns, DPP still prunes the scan. Also guards
    the counter against the max_by partial-buffer smuggling hazard."""
    import tempfile

    from sitecheck_spark.plans.checks import shuffle_exchanges_carrying
    from sitecheck_spark.sources.catalog import (
        PAGES_BUCKET_COL,
        bucket_of,
        read_pages_bucketed,
        write_pages_bucketed,
    )

    d = tempfile.mkdtemp() + "/pages_bucketed_sx"
    src = spark.createDataFrame(make_pages_pdf(60), PAGES_SCHEMA)
    write_pages_bucketed(src, d, n_buckets=8)
    pages, n_buckets = read_pages_bucketed(spark, d)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pages_slim = pages.select("url", "warc_ts", "html", PAGES_BUCKET_COL)
        elected = spark.createDataFrame(
            [("https://big.example.com/p/0.html", "big.example.com", 0, 0.0,
              None, 0)],
            "url string, netloc string, depth int, priority double, "
            "referrer string, redirects int",
        ).filter(F.col("depth") <= 5)
        keys = [PAGES_BUCKET_COL, "url"]
        e_urls = (
            elected.select("url")
            .withColumn(PAGES_BUCKET_COL, bucket_of(F.col("url"), n_buckets))
            .repartition(6, *keys)
        )
        matched = pages_slim.join(e_urls, keys)
        latest = matched.groupBy(*keys).agg(
            F.max_by("html", F.struct("warc_ts", F.md5("html"))).alias("html")
        )
        fetched = (
            elected.withColumn(PAGES_BUCKET_COL,
                               bucket_of(F.col("url"), n_buckets))
            .join(latest, keys, "left")
            .drop(PAGES_BUCKET_COL)
        )
        parsed_input = fetched.filter(F.col("html").isNotNull()).select(
            "url", "netloc", "depth", "priority", "referrer", "redirects", "html"
        )
        plan = formatted_plan(parsed_input)
        assert "dynamicpruning" in plan.lower(), plan
        carrying = shuffle_exchanges_carrying(parsed_input, "html")
        assert len(carrying) == 1, plan
        # negative control: aggregating on url alone would re-shuffle the
        # max_by buffer (html bytes under a fresh attribute) — the counter
        # must see through that
        bad = matched.groupBy("url").agg(
            F.max_by("html", F.struct("warc_ts", F.md5("html"))).alias("html")
        )
        assert len(shuffle_exchanges_carrying(bad, "html")) == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_exact_dedup_is_single_shuffle(spark):
    from sitecheck_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = exact_dedup(docs)
    # partial aggregation upstream, exactly one hash exchange
    assert count_shuffles(q) == 1
    plan = formatted_plan(q)
    assert "partial_min" in plan and "partial_count" in plan


def test_html_zero_shuffle_bucketed_table_fetch(spark):
    """The bucketed-TABLE fetch (catalog.write_pages_bucketed_table, the
    storage-partitioned-join shape an Iceberg bucket(N,url) table gives):
    the pages scan reports its bucketing, so the fetch join shuffles only
    the slim elected side and the version-dedup agg reuses the join
    partitioning — html:binary crosses ZERO exchanges. This removes the
    per-wave html shuffle that caps 4N scaling on shared-disk hosts."""
    import tempfile as _tf

    from sitecheck_spark.plans.checks import shuffle_exchanges_carrying
    from sitecheck_spark.sources.catalog import (
        register_pages_bucketed_table,
        write_pages_bucketed_table,
    )

    src = spark.createDataFrame(make_pages_pdf(60), PAGES_SCHEMA)
    loc = _tf.mkdtemp() + "/pages_btable_plan"
    write_pages_bucketed_table(src, n_buckets=8, table="pages_bt_plan", path=loc)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pages = spark.table("pages_bt_plan").select("url", "warc_ts", "html")
        elected = spark.createDataFrame(
            [("https://big.example.com/p/0.html", "big.example.com", 0, 0.0,
              None, 0)],
            "url string, netloc string, depth int, priority double, "
            "referrer string, redirects int",
        )
        matched = pages.join(elected.select("url"), "url")
        latest = matched.groupBy("url").agg(
            F.max_by("html", F.struct("warc_ts", F.md5("html"))).alias("html")
        )
        fetched = elected.join(latest, "url", "left")
        parsed_input = fetched.filter(F.col("html").isNotNull()).select(
            "url", "netloc", "depth", "priority", "referrer", "redirects", "html"
        )
        plan = formatted_plan(parsed_input)
        assert "Bucketed: true" in plan, plan
        carrying = shuffle_exchanges_carrying(parsed_input, "html")
        assert len(carrying) == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_table_crawl_equals_plain_crawl(spark):
    """End-to-end: the zero-html-shuffle bucketed-table fetch must produce
    the identical crawl as the plain path, including re-registration of the
    table files in a catalog-naive way (fresh table name over the same
    directory, as a new session would)."""
    import tempfile as _tf

    from sitecheck_spark.crawl import CrawlConfig, crawl
    from sitecheck_spark.sources.catalog import (
        register_pages_bucketed_table,
        write_pages_bucketed_table,
    )
    from sitecheck_spark.sources.corpus import make_seeds_pdf

    src = spark.createDataFrame(make_pages_pdf(60), PAGES_SCHEMA)
    loc = _tf.mkdtemp() + "/pages_btable_e2e"
    write_pages_bucketed_table(src, n_buckets=8, table="pages_bt_e2e", path=loc)
    # a fresh session only has the files: re-declare and use THAT table
    reread = register_pages_bucketed_table(
        spark, loc, n_buckets=8, table="pages_bt_e2e_rereg"
    )

    seeds = make_seeds_pdf().url.tolist()
    base = dict(budget_per_host=3, max_waves=4, n_shards=4, salt_buckets=2,
                run_checkers=False)
    plain = crawl(spark, src, seeds, CrawlConfig(**base))
    btable = crawl(spark, reread, seeds,
                   CrawlConfig(**base, pages_prebucketed=True,
                               broadcast_fetch=False))
    key = lambda res: sorted(
        (r["wave"], r["url"], r["status"]) for r in res.fetch_log.collect()
    )
    assert key(plain) == key(btable)
    assert {r["url"] for r in plain.seen.collect()} == {
        r["url"] for r in btable.seen.collect()
    }
    plain.release()
    btable.release()


def test_sidecar_modulus_guard_beats_row_sampling(spark):
    """The bucketed-layout modulus guard must use the sidecar's recorded
    n_buckets (authoritative), not just a row sample: for half of all
    hashes pmod(h, 2N) == pmod(h, N), so a corpus restricted to such urls
    sails through any sample check with a doubled modulus while the fetch
    join would read the wrong partitions. Corpus here is exactly that
    adversarial restriction — only the sidecar can catch it."""
    import tempfile as _tf

    from sitecheck_spark.crawl import CrawlConfig, crawl
    from sitecheck_spark.sources.catalog import (
        bucket_of,
        read_pages_bucketed,
        write_pages_bucketed,
    )

    src = (
        spark.createDataFrame(make_pages_pdf(80), PAGES_SCHEMA)
        .filter(bucket_of(F.col("url"), 16) == bucket_of(F.col("url"), 8))
    )
    assert src.count() > 10
    d = _tf.mkdtemp() + "/pages_sidecar_guard"
    write_pages_bucketed(src, d, n_buckets=8)
    pages, _n = read_pages_bucketed(spark, d)
    # every row agrees with modulus 16, so a sample check passes wrongly
    agree = pages.filter(
        bucket_of(F.col("url"), 16) != F.col("url_bucket")
    ).count()
    assert agree == 0
    with pytest.raises(ValueError, match="sidecar"):
        crawl(
            spark, pages, ["https://big.example.com/p/0.html"],
            CrawlConfig(max_waves=1, n_shards=4, salt_buckets=2,
                        pages_buckets=16, run_checkers=False),
        )


def test_register_bucketed_table_spec_mismatch_raises(spark):
    """CREATE TABLE IF NOT EXISTS silently reusing a pre-existing table
    with a different location/bucket spec would make the
    storage-partitioned fetch join drop matches (phantom 404s) — the
    register call must raise instead."""
    import tempfile as _tf

    from sitecheck_spark.sources.catalog import (
        register_pages_bucketed_table,
        write_pages_bucketed_table,
    )

    src = spark.createDataFrame(make_pages_pdf(30), PAGES_SCHEMA)
    loc = _tf.mkdtemp() + "/pages_bt_spec"
    write_pages_bucketed_table(src, n_buckets=8, table="pages_bt_spec", path=loc)
    # same spec: fine (the restart-and-re-register path)
    register_pages_bucketed_table(spark, loc, n_buckets=8, table="pages_bt_spec")
    with pytest.raises(ValueError, match="different spec"):
        register_pages_bucketed_table(spark, loc, n_buckets=4,
                                      table="pages_bt_spec")
    with pytest.raises(ValueError, match="different spec"):
        register_pages_bucketed_table(spark, _tf.mkdtemp() + "/elsewhere",
                                      n_buckets=8, table="pages_bt_spec")


def test_register_bucketed_table_file_layout_guard(spark):
    """Declaring a FRESH table name over files bucketed under a different
    modulus must fail the sample guard: the bucket id in each file name has
    to equal pmod(hash(url), declared_n)."""
    import tempfile as _tf

    from sitecheck_spark.sources.catalog import (
        register_pages_bucketed_table,
        write_pages_bucketed_table,
    )

    src = spark.createDataFrame(make_pages_pdf(30), PAGES_SCHEMA)
    loc = _tf.mkdtemp() + "/pages_bt_files"
    write_pages_bucketed_table(src, n_buckets=8, table="pages_bt_files", path=loc)
    with pytest.raises(ValueError, match="bucket ids"):
        register_pages_bucketed_table(spark, loc, n_buckets=16,
                                      table="pages_bt_files_wrongn")


def test_bucket_layout_guard_rejects_nested_layout(spark):
    """A table root whose data files sit in SUBDIRECTORIES (partitioned or
    hand-laid layout) must fail the layout guard loudly instead of
    vacuously passing with zero files checked (the old non-recursive sweep
    returned as 'empty table')."""
    import os
    import shutil
    import tempfile as _tf

    from sitecheck_spark.sources.catalog import (
        register_pages_bucketed_table,
        write_pages_bucketed_table,
    )

    src = spark.createDataFrame(make_pages_pdf(30), PAGES_SCHEMA)
    flat = _tf.mkdtemp() + "/pages_bt_flat"
    write_pages_bucketed_table(src, n_buckets=8, table="pages_bt_flat",
                               path=flat)
    nested = _tf.mkdtemp() + "/pages_bt_nested"
    os.makedirs(os.path.join(nested, "sub"))
    for name in os.listdir(flat):
        if not name.startswith(("_", ".")):
            shutil.copy(os.path.join(flat, name),
                        os.path.join(nested, "sub", name))
    with pytest.raises(ValueError, match="no data files at the table root"):
        register_pages_bucketed_table(spark, nested, n_buckets=8,
                                      table="pages_bt_nested")
