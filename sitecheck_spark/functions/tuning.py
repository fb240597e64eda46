"""Scale-adaptive physical-plan sizing helpers (guide §2.2/§2.5).

The session's spark.sql.shuffle.partitions is sized for the biggest
corpus-scale shuffles. Iterative operators and per-wave crawl state move
orders of magnitude fewer bytes per round; planning THEIR exchanges at the
session width degrades each stage into dozens of near-empty tasks whose
scheduling barriers dominate wall time (measured: connected_components
9.2 s -> 2.3 s at sf1.0, crawl ~54 -> ~47 s, both local[32]).

`scoped_shuffle_partitions` derives a partition count from the ROW VOLUME
the caller is about to shuffle — one partition per `rows_per_partition`
rows, floored so small inputs keep some parallelism, CAPPED at the session
value so at-scale inputs keep full cluster-sized partitioning (the derived
value only ever shrinks the plan; it never overrides an operator's explicit
repartition counts, e.g. the crawl's parse partitions). Physical-plan only:
results are partitioning-independent.
"""

from __future__ import annotations


def sized_partitions(spark, n_rows: int, rows_per_partition: int,
                     floor: int = 8) -> int:
    conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return min(conf, max(-(-n_rows // rows_per_partition), min(floor, conf)))


class scoped_shuffle_partitions:
    """Temporarily scope spark.sql.shuffle.partitions to sized_partitions(
    n_rows). No-op when n_rows is None or the derived value equals the
    session value. Session-wide while held (PySpark conf is session state),
    so hold it only around this operator's own jobs."""

    def __init__(self, spark, n_rows: int | None, rows_per_partition: int,
                 floor: int = 8):
        self.spark = spark
        self.n = n_rows
        self.rpp = rows_per_partition
        self.floor = floor
        self.prev: str | None = None

    def __enter__(self):
        if self.n is None:
            return self
        parts = sized_partitions(self.spark, self.n, self.rpp, self.floor)
        prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        if parts != int(prev):
            self.prev = prev
            self.spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        return self

    def __exit__(self, *exc):
        if self.prev is not None:
            self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
            self.prev = None
        return False
