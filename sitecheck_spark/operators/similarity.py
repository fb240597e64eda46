"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: JVM-side zip_with/aggregate dot products; the
  scale baseline (one broadcast of the query set, no shuffle of the corpus).
- LSH-bucketed ANN: deterministic random-hyperplane signatures restrict the
  candidate set to same-bucket vectors (multi-probe via sign flips would be
  the recall knob at scale). Hyperplanes derive from sin(seed) so they are
  reproducible with zero data movement; last-ulp sign flips near zero make
  this rows-only checked vs DuckDB.
- embedding-cosine near-dup pairs for dedup (threshold variant).
- IVF-flat ANN: a trained coarse quantizer (ivf_fit — deterministic init +
  Lloyd rounds as DataFrame aggs) routes queries to nprobe inverted lists
  (ivf_topk) — the data-adaptive counterpart to the fixed LSH cuts, and
  the layout that wins on clustered corpora. Rows-only checked (Lloyd
  means are FP-order-sensitive across engines); recall bounded in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 3
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries: (vec_id, embedding) — expected small => broadcast; the corpus
    is scanned once with no shuffle until the per-query top-k aggregation.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    joined = embeddings.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def _hyperplane(dim: int, plane: int):
    """Deterministic pseudo-random hyperplane: sin(1 + plane*dim + i)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.sin(F.lit(1.0) + F.lit(float(plane)) * F.lit(float(dim)) + i.cast("double")),
    )


def planes_for(n_vectors: int, target_bucket_size: int = 256) -> int:
    """Sizing rule for the hyperplane count: buckets ~ 2**planes, so
    planes = ceil(log2(n / target_bucket_size)) keeps the EXPECTED bucket
    population near target_bucket_size regardless of corpus size — the
    within-bucket self-join stays O(n * target) instead of going quadratic
    when a fixed plane count meets a 10^9-vector corpus. Floor of 4 keeps
    tiny corpora from degenerating to one bucket."""
    import math

    if n_vectors <= target_bucket_size:
        return 4
    return max(4, math.ceil(math.log2(n_vectors / target_bucket_size)))


def lsh_bucket(embeddings: DataFrame, n_planes: int = 8, dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (sign-bit signature).

    Size n_planes with planes_for(corpus_size) — at 10^10 vectors a fixed
    8-plane / 256-bucket layout makes every bucket hold ~40M vectors and
    the bucketed self-join quadratic again."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        bit = F.when(_dot(F.col("embedding"), _hyperplane(dim, p)) >= 0, 1).otherwise(0)
        sig = sig + bit.cast("long") * F.lit(1 << p).cast("long")
    return embeddings.withColumn("bucket", sig)


def lsh_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 3,
    n_planes: int | None = None, dim: int = 64, multi_probe: bool = False,
    n_vectors: int | None = None,
) -> DataFrame:
    """ANN top-k restricted to same-LSH-bucket candidates.

    At scale: corpus bucketed once (write-time partition column), query
    join prunes to matching buckets — a partition-pruned scan instead of a
    full sweep. Recall < 1 by construction; the brute-force operator is the
    exactness baseline. multi_probe=True additionally probes every bucket
    at Hamming distance 1 from the query's signature (n_planes+1 buckets
    per query) — the standard recall knob: near-neighbors lost to a single
    hyperplane sign flip are recovered at ~(n_planes+1)x candidate cost,
    still independent of corpus size. Measured recall@3 vs brute force
    (2000 vecs, 10 queries, k=3): clustered corpus 0.80 -> 0.93 at 4
    planes, 0.60 -> 0.90 at 8; the sf0.1 test embeddings are uniform NOISE
    (every neighbor is near-orthogonal), the worst case for sign-LSH:
    0.20 -> 0.43. tests/test_operators.py::test_lsh_multi_probe_recall pins
    the ordering; README has the table.

    n_planes=None (the default): WITH multi_probe the signature is sized
    from the corpus via planes_for() — the Hamming-1 probes compensate the
    recall each extra plane costs, so candidate volume stays
    ~(n_planes+1)*target_bucket at any corpus size. Single-probe keeps a
    FIXED 8 planes: growing planes with the corpus shrinks buckets and
    drives single-probe recall well below the documented table, so
    corpus-sized signatures without multi-probe are deliberately not
    offered (pass n_planes explicitly to override).

    n_vectors: optional corpus-size hint for the auto-sizing path. Without
    it the operator issues embeddings.count() — footer-metadata-cheap on a
    raw parquet scan, but a REAL scan when the input is derived (filter/
    join/UDF upstream); thread the known count in for derived inputs."""
    if n_planes is None:
        if multi_probe:
            n_planes = planes_for(
                n_vectors if n_vectors is not None else embeddings.count()
            )
        else:
            n_planes = 8
            # 2^8 buckets: expected bucket population is n/256. Warn when a
            # provided size hint says that's oversized — the bucket join's
            # candidate volume grows linearly with it (no count job is
            # issued just to warn; pass n_vectors to get the check).
            if n_vectors is not None and n_vectors / (1 << n_planes) > 10_000:
                import warnings

                warnings.warn(
                    f"lsh_topk single-probe default keeps 8 planes; with "
                    f"n_vectors={n_vectors} the expected bucket holds "
                    f"~{n_vectors // (1 << n_planes)} vectors. Use "
                    f"multi_probe=True (auto-sized planes) or pass n_planes "
                    f"explicitly to bound candidate volume.",
                    stacklevel=2,
                )
    corpus = lsh_bucket(embeddings, n_planes, dim)
    q = lsh_bucket(queries, n_planes, dim).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
        )
        q = q.select(
            "query_id", "q_emb", F.explode(probes).alias("bucket")
        )
    joined = corpus.join(F.broadcast(q), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
    )
    # No dedup needed even under multi-probe: each corpus vector lives in
    # exactly one bucket and the n_planes+1 probe signatures per query are
    # pairwise distinct, so a (query, neighbor) pair matches at most one
    # probe. (Revisit only if multi-bucket corpus replication is added.)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def centroids_for(n_vectors: int, max_centroids: int = 65536) -> int:
    """IVF sizing rule: n_centroids = ceil(sqrt(n)), the classical balance
    point — inverted lists and the coarse quantizer both stay ~sqrt(n), so
    per-query candidate volume is nprobe*sqrt(n) instead of n. Capped at
    65536 (64-dim float64 centroids = 32 MB, comfortably broadcastable);
    past the cap, list size grows linearly again — raise nprobe to
    compensate. Floor of 4 keeps tiny corpora from degenerating."""
    import math

    return max(4, min(math.ceil(math.sqrt(max(n_vectors, 1))), max_centroids))


def _assign_nearest(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment, JVM-side: broadcast-nested-loop the
    (small) centroid set against the corpus and collapse the k scored rows
    per vector with a map-side max_by partial aggregation — the corpus
    itself never shuffles; only one slim (vec_id, centroid_id, embedding)
    row per vector per partition crosses the exchange. Ties break to the
    smallest centroid_id (struct ordering), so assignment is deterministic.

    Zero-norm vectors/centroids score exactly 0.0 (the norm product is
    clamped at 1e-12 — plain cosine() would raise DIVIDE_BY_ZERO under
    ANSI mode); _assign_nearest_gemm clamps identically, so the two paths
    agree on these edges too, not just on well-behaved data.

    This path is whole-stage-codegen'd but materializes n*k scored rows;
    it is the right shape up to ~10^3 centroids. Past that (10^9+ corpora
    want sqrt(n) centroids), use _assign_nearest_gemm — one Arrow batch
    per partition through numpy's matmul."""
    c = centroids.select(
        F.col("centroid_id").alias("_cid"), F.col("centroid").alias("_cvec")
    )
    a, b = F.col("embedding"), F.col("_cvec")
    guarded = _dot(a, b) / F.greatest(_norm(a) * _norm(b), F.lit(1e-12))
    scored = vectors.join(F.broadcast(c)).select(
        "vec_id", "embedding", "_cid", guarded.alias("_score"),
    )
    return scored.groupBy("vec_id").agg(
        F.max_by(
            "_cid", F.struct(F.col("_score"), (-F.col("_cid")).alias("_nc"))
        ).alias("centroid_id"),
        F.first("embedding").alias("embedding"),
    )


def _assign_nearest_gemm(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment as one numpy GEMM per Arrow batch: the
    scale path when the centroid count makes the n*k BNLJ row inflation of
    _assign_nearest too expensive (sqrt(n) centroids at a 10^9+ corpus).
    The centroid matrix ships to executors ONCE via a Spark broadcast (not
    per-task closure capture); each mapInPandas batch computes all k
    similarities with a single matmul and emits only the argmax — the
    corpus crosses zero exchanges. Vectorized per-batch, never per-row
    (SURVEY §2.10).

    Tie/edge parity with _assign_nearest (so the two paths are
    interchangeable, not just usually-equal): centroids are sorted by id
    and np.argmax takes the FIRST maximum, so exact-score ties resolve to
    the smallest centroid_id — the same tie-break the JVM max_by struct
    encodes. Zero norms are clamped to 1e-12 on both sides (score exactly
    0.0), the same guard _assign_nearest applies, so zero-norm vectors and
    centroids route identically on the two paths."""
    import numpy as np

    # sorted by id => np.argmax's first-wins == smallest-centroid_id ties
    rows = centroids.select("centroid_id", "centroid").orderBy(
        "centroid_id"
    ).collect()  # <= 65536
    ids = np.array([r["centroid_id"] for r in rows], dtype="int64")
    mat = np.array([r["centroid"] for r in rows], dtype="float64")
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    bc = vectors.sparkSession.sparkContext.broadcast((ids, mat.T))

    def assign(batches):
        cid, mat_t = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(pdf["embedding"].tolist(), dtype="float64")
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            pdf = pdf[["vec_id", "embedding"]].copy()
            pdf["centroid_id"] = cid[np.argmax(v @ mat_t, axis=1)]
            yield pdf

    return vectors.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, embedding array<float>, centroid_id long"
    )


def ivf_fit(
    embeddings: DataFrame, n_centroids: int | None = None, iters: int = 2,
    n_vectors: int | None = None,
) -> DataFrame:
    """Train an IVF coarse quantizer: deterministic hash-rank init (the
    n_centroids smallest xxhash64(vec_id) — a distributed TakeOrdered, no
    global sort) followed by `iters` Lloyd rounds expressed as DataFrame
    aggregations: posexplode to (centroid, pos, val) partials, avg per
    coordinate, re-assemble the mean vector with array_sort+transform.
    Every step is a partial-aggregated shuffle of k*dim rows — the corpus
    shuffles nothing. Clusters that lose all members simply drop out
    (standard IVF behavior; nprobe probes the survivors).

    Returns (centroid_id int, centroid array<double>). At a real 10^10
    corpus this runs once at ingest and persists next to the table, like
    any FAISS index build."""
    if n_centroids is None:
        n_centroids = centroids_for(
            n_vectors if n_vectors is not None else embeddings.count()
        )
    init = (
        embeddings.select("vec_id", "embedding",
                          F.xxhash64("vec_id").alias("_h"))
        .orderBy("_h").limit(n_centroids)     # TakeOrderedAndProject
        .coalesce(1)
        .select(
            (F.row_number().over(Window.orderBy("_h")) - 1).alias("centroid_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
        )
    )
    centroids = init
    for _ in range(iters):
        assigned = _assign_nearest(embeddings, centroids)
        centroids = (
            assigned.select(
                "centroid_id", F.posexplode("embedding").alias("pos", "val")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm"))
            .select(
                "centroid_id",
                F.transform("_pm", lambda s: s["m"]).alias("centroid"),
            )
        )
    return centroids


def ivf_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 3, nprobe: int = 2,
    n_centroids: int | None = None, iters: int = 2,
    centroids: DataFrame | None = None, n_vectors: int | None = None,
    gemm: bool = False,
) -> DataFrame:
    """IVF-flat ANN top-k: route each query to its nprobe nearest centroids
    and brute-force only those inverted lists — the centroid-partitioned
    alternative to lsh_topk's hyperplane buckets, and the layout that wins
    when the corpus is clustered (lists follow the data's own geometry
    instead of fixed random cuts).

    Scale shape: the inverted lists are the corpus + a centroid_id column —
    at 10^10 vectors they are written ONCE, partitioned by centroid_id
    (exactly like the LSH bucket column), so a query batch prunes its scan
    to nprobe*sqrt(n) candidates per query. Training cost is the one-time
    index build. Candidates join via broadcast of the (small) probe set;
    the lists never shuffle. recall < 1 by construction — bounded vs the
    oracle-checked brute-force baseline in pytest, rows-only vs DuckDB
    (Lloyd means are FP-order-sensitive across engines).

    gemm=True switches assignment to the mapInPandas matmul path
    (_assign_nearest_gemm) — equality-tested against the JVM path; pick it
    when n_centroids is past ~10^3.

    centroids: pass a pre-trained quantizer (ivf_fit output) to skip
    training — the production shape where the index is built at ingest."""
    if centroids is None:
        centroids = ivf_fit(embeddings, n_centroids, iters, n_vectors)
    lists = (_assign_nearest_gemm if gemm else _assign_nearest)(
        embeddings, centroids
    )
    c = centroids.select(
        F.col("centroid_id"), F.col("centroid").alias("_cvec")
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    q_scored = q.join(F.broadcast(c)).select(
        "query_id", "q_emb", "centroid_id",
        cosine(F.col("q_emb"), F.col("_cvec")).alias("_score"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("_score"), F.asc("centroid_id")
    )
    probes = (
        q_scored.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "q_emb", "centroid_id")
    )
    cands = lists.join(F.broadcast(probes), "centroid_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95, n_planes: int | None = None,
    n_vectors: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH-bucketed self-join.

    n_planes grows with the corpus (default None = planes_for(count)): the
    self-join is quadratic WITHIN each bucket, so expected bucket size —
    n / 2**planes — is the scale knob; the default keeps it near 256
    regardless of corpus size. Raising planes trades recall for join size;
    recover recall by unioning runs at shifted plane seeds rather than
    shrinking planes.

    n_vectors: optional corpus-size hint — without it the sizing probe is
    embeddings.count(), free on a raw parquet scan but a real scan on a
    derived input (see lsh_topk)."""
    if n_planes is None:
        n_planes = planes_for(
            n_vectors if n_vectors is not None else embeddings.count()
        )
    corpus = lsh_bucket(embeddings, n_planes=n_planes)
    a = corpus.alias("a")
    b = corpus.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
