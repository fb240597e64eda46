"""Link-graph operators for crawl prioritization.

A frontier at 10^10 URLs cannot fetch everything; the reference crawls
FIFO, but a scale crawler orders its priority queue by link centrality.
`pagerank` computes that signal as iterative DataFrame joins — the same
shape as the crawl loop itself (SURVEY.md §2.8 R2: priority is a column,
recomputed per wave).

Determinism contract: ranks are BIGINT fixed-point (units of 1e-12), all
updates use integer division (`div`), and integer sums are order-independent
— so the DuckDB oracle reproduces the exact same integers, no float-sum
ordering hazards. The damping update is

    rank' = 0.15 * R0 + 0.85 * sum_{src->node} (rank(src) div outdeg(src))

with R0 = 10^12 and x*0.85 computed overflow-safely as
85*(x div 100) + (85*(x mod 100)) div 100 — algebraically identical to
(85*x) div 100 for x >= 0, but never forms the product 85*x, which for a
hub node with ~1e5x-average in-rank would exceed Long.MAX (Spark non-ANSI
wraps silently; DuckDB raises — either way cross-engine exactness dies).

Dangling-node semantics (documented deviation from classic PageRank): mass
arriving at sink nodes is NOT redistributed uniformly — it decays out of
the system, exactly as in the "toy" damped update above. For crawl
prioritization this is the desired behavior (a page nobody can leave
should not inflate everyone else); the ranks are therefore NOT a
probability distribution (sum < n * R0 when sinks exist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

R0 = 10**12  # fixed-point unit: rank 1.0 == 10^12


def pagerank(
    nodes: DataFrame, edges: DataFrame, iterations: int = 5,
    checkpoint_every: int = 10,
) -> DataFrame:
    """(node, pr:bigint) after `iterations` damped power-iteration steps.

    nodes: one `node` column (every vertex, even sink/source-only ones);
    edges: (src, dst). Each iteration is one equi-join + one aggregation —
    shuffle keys stay (src|node), so at scale both sides pre-partition on
    the node id and every iteration reuses the same partitioning.

    Lineage grows linearly with iterations, so every `checkpoint_every`
    steps the rank table is localCheckpoint'ed (eager) to truncate it —
    without this, production iteration counts (30-50) balloon plan depth
    and driver re-analysis cost.
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = nodes.withColumn("pr", F.lit(R0).cast("long"))
    # overflow-safe 0.85 damping: never forms 85*s (see module docstring)
    damped = ("85 * (coalesce(s, 0) div 100) "
              "+ (85 * (coalesce(s, 0) % 100)) div 100")
    for i in range(iterations):
        contribs = (
            edges.join(deg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("pr div outdeg")).alias("s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(15 * R0 // 100) + F.expr(damped))
                .cast("long").alias("pr"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
