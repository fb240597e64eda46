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


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = 40,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, component) — component = the MINIMUM node id reachable from
    `node` over the undirected closure of `edges`. Web-graph companion to
    `pagerank`: mirror-site / duplicate-cluster discovery and per-component
    crawl budgeting (SURVEY.md §2.10d X26).

    Algorithm: HashMin label propagation + pointer jumping. Every round,
    each node's label drops to the min of its own and its neighbors'
    labels (one edges⋈labels join + groupBy-min, both keyed on the node
    id), then labels chase one level of indirection — lbl ← lbl(lbl) — via
    a self-join (pointer jumping / path halving). Propagation alone needs
    O(diameter) rounds; the jump step halves label-chain depth each round,
    so convergence is O(log n) rounds even on a path graph. Each round is
    a constant number of hash shuffles on the node key; nothing ever
    gathers at the driver but a one-row aggregate.

    Convergence detection without a row-compare join: labels are
    per-node non-increasing (every update is a min), so the fixpoint is
    reached exactly when SUM(label) stops falling. The sum runs in
    decimal(38,0) — exact at any node count, immune to bigint wrap — and
    doubles as the per-round materializing action. At the HashMin fixpoint
    label(u) <= label(v) across every (symmetric) edge, hence labels are
    constant per component; the constant is an id of a member node and the
    component's min member labels itself, so the constant IS the min.
    Deterministic regardless of partitioning/execution order — min is
    order-independent — so the result is oracle-checkable (DuckDB
    recursive-CTE twin in queries.py).

    nodes: one `node` column (isolated nodes keep component = own id);
    edges: (src, dst), direction ignored, self-loops/duplicates fine.
    Raises if `max_rounds` passes without reaching the fixpoint (the loud
    option: a silent partial labeling corrupts downstream grouping).
    """
    sym = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).where(
        F.col("a") != F.col("b")
    )
    sym = (
        sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    lbl = nodes.select("node", F.col("node").alias("lbl")).persist()
    prev_sum = None
    handles = [sym, lbl]
    try:
        for r in range(max_rounds):
            prop = (
                sym.join(lbl.select(F.col("node").alias("b"), "lbl"), "b")
                .groupBy(F.col("a").alias("node"))
                .agg(F.min("lbl").alias("nbr_lbl"))
            )
            stepped = lbl.join(prop, "node", "left").select(
                "node",
                F.least("lbl", F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
            )
            # pointer jump: lbl <- lbl(lbl). Labels always name nodes in the
            # same component, and lbl(x) <= x, so the chase only descends.
            jumped = stepped.join(
                stepped.select(
                    F.col("node").alias("jnode"), F.col("lbl").alias("jlbl")
                ),
                F.col("lbl") == F.col("jnode"),
                "left",
            ).select("node", F.coalesce("jlbl", "lbl").alias("lbl"))
            if checkpoint_every and (r + 1) % checkpoint_every == 0:
                jumped = jumped.localCheckpoint(eager=True)
            else:
                jumped = jumped.persist()
                handles.append(jumped)
            cur_sum = jumped.agg(
                F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]
            lbl = jumped
            if cur_sum == prev_sum:
                # materialize before the finally-block unpersists the chain
                return lbl.select(
                    "node", F.col("lbl").alias("component")
                ).localCheckpoint(eager=True)
            prev_sum = cur_sum
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    finally:
        for h in handles:
            h.unpersist()
