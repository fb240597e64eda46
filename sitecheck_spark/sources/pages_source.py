"""Custom Python Data Source (SURVEY.md §2.1 S5): `synthetic_pages`.

Exposes the deterministic corpus generator through Spark's DataSource V2
Python API, so a corpus of any size can be read as

    spark.dataSource.register(SyntheticPagesDataSource)
    spark.read.format("synthetic_pages")
         .option("n_pages", 100000).option("seed", 42).load()

Partition planning splits the global id range evenly; every row is a pure
function of (seed, global id), so output is identical regardless of the
partition count — the same guarantee generate_pages_spark gives, but behind
the standard source API (a real HTTP fetcher source would slot in the same
way, per SURVEY.md §2.1 S5).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


class _Range(InputPartition):
    def __init__(self, start: int, end: int, is_first: bool, include_robots: bool):
        self.start = start
        self.end = end
        self.is_first = is_first
        self.include_robots = include_robots


class SyntheticPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_pages = int(options.get("n_pages", 1000))
        self.seed = int(options.get("seed", 42))
        self.n_partitions = int(options.get("partitions", 8))
        self.include_robots = str(options.get("robots", "true")).lower() == "true"

    def partitions(self):
        step = max(1, (self.n_pages + self.n_partitions - 1) // self.n_partitions)
        parts = []
        for i, start in enumerate(range(0, self.n_pages, step)):
            parts.append(
                _Range(start, min(start + step, self.n_pages), is_first=(i == 0),
                       include_robots=self.include_robots)
            )
        return parts

    def read(self, partition: _Range):
        # imports here: runs on executors
        from sitecheck_spark.sources.corpus import (
            _redirect_rows,
            _robots_rows,
            _rows_for_global_ids,
        )

        yield from _rows_for_global_ids(
            range(partition.start, partition.end), self.n_pages, self.seed
        )
        if partition.is_first:
            # redirect + robots pages ride the first partition (few rows);
            # redirect pages are corpus proper, robots stays opt-outable —
            # exactly make_pages_pdf's semantics
            yield from _redirect_rows(self.n_pages)
            if partition.include_robots:
                yield from _robots_rows()


class SyntheticPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_pages"

    def schema(self) -> str:
        return PAGES_SCHEMA_DDL

    def reader(self, schema) -> SyntheticPagesReader:
        return SyntheticPagesReader(self.options)
