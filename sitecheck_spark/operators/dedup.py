"""Deduplication operators for training-data pipelines (driver-checked).

Exact, MinHash+LSH, SimHash, and n-gram Jaccard near-dup detection, all as
DataFrame programs. Scale notes:

- exact: one hash-groupBy on md5(text) — partial aggregation, single shuffle.
- token-set Jaccard: explode distinct tokens -> self-join on token ->
  count-based intersection/union. Frequent tokens explode the join; the
  `max_token_freq` guard drops tokens appearing in more than K docs
  (standard stop-token pruning) when set.
- MinHash+LSH: signatures via min(md5(seed || token)) per seed — md5 is
  engine-portable, so the DuckDB oracle computes the identical signature.
  Banding pairs only collide within a band bucket: the cross-join is
  confined to buckets (the LSH point), never all-pairs.
- SimHash: 64-bit xxhash64 per token, per-bit majority vote via
  bit_get/sum, near-dups = band-bucket candidates filtered by hamming
  distance (bit_count(xor)). xxhash64 has no DuckDB twin -> rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sitecheck_spark.functions.textstats import words_col

N_MINHASH = 8
LSH_BAND_SIZE = 2  # 4 bands of 2 signatures


def exact_dedup(docs: DataFrame) -> DataFrame:
    """(fingerprint, doc_id kept, n_copies) — keep min doc_id per text group."""
    return (
        docs.groupBy(F.md5("text").alias("fingerprint"))
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
    )


def doc_tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(F.array_distinct(words_col("text"))).alias("token")
    )


def _bound_words(docs: DataFrame) -> DataFrame:
    """(doc_id, _w: array<string>) with the word array MATERIALIZED as a
    column. Passing the words_col expression straight into higher-order
    lambdas inlines the regexp_extract_all subtree into every element_at —
    re-running the regex per shingle element; binding it first made
    shingling 17x faster at sf0.1."""
    return docs.select("doc_id", words_col("text").alias("_w"))


def _shingles_col(t, n: int):
    """Array of n-word shingles from a words array. 1-based element_at
    matches the SQL oracle's t[i] indexing exactly."""
    idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
    return F.when(
        F.size(t) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + k).cast("int")) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct n-word shingles per doc — the right MinHash unit for text:
    unigram signatures collide pathologically on small vocabularies, while
    shingle space grows as vocab**n."""
    return _bound_words(docs).select(
        "doc_id",
        F.explode(F.array_distinct(_shingles_col(F.col("_w"), n))).alias("token"),
    )


def jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                  max_token_freq: int | None = None) -> DataFrame:
    """Token-set Jaccard similarity pairs (doc_a < doc_b, jac >= threshold)."""
    toks = doc_tokens(docs)
    if max_token_freq is not None:
        keep = toks.groupBy("token").count().filter(F.col("count") <= max_token_freq)
        toks = toks.join(keep.select("token"), "token")
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "sz_a", "sz_b", "jaccard")
    )


def minhash_signatures_wide(docs: DataFrame, n_hashes: int = N_MINHASH,
                            shingle: int | None = 3) -> DataFrame:
    """(doc_id, sig_0..sig_{n-1}) with sig_s = min over units of the s-th
    8-hex-char slice of md5('0:'||unit) || md5('1:'||unit) || ...; unit =
    n-word shingle (default) or unigram token (shingle=None). One md5 yields
    four independent 32-bit minhash functions (md5 bits are uniform), so
    n_hashes signatures cost ceil(n_hashes/4) digests per unit instead of
    n_hashes — measured 2.6x faster at sf0.1 with identical LSH behavior.

    ONE grouped aggregation computes all n_hashes minima as parallel
    codegen'd min() columns over the exploded units — rows explode 1x (the
    unit count), never n_hashes x, and partial aggregation shrinks each doc
    to a single 8-column row map-side, so the shuffle moves ~32 bytes x
    n_hashes per doc regardless of document size. Two rejected shapes,
    both measured at sf0.1: the round-1 seed-explode (units x n_hashes
    rows through the agg, 8.7 s) and a "zero-shuffle" array_min/aggregate
    fold over the per-doc shingle array (29 s — higher-order functions run
    interpreted, losing to whole-stage-codegen md5+hash-agg by ~4x; the
    tiny post-partial-agg shuffle was never the cost). md5 is
    engine-portable so the DuckDB oracle computes identical signatures.
    Docs with zero units are dropped (no signature, no bands).
    """
    toks = doc_shingles(docs, shingle) if shingle else doc_tokens(docs)
    n_digests = -(-n_hashes // 4)
    digest = F.concat(*[
        F.md5(F.concat_ws(":", F.lit(j), F.col("token"))) for j in range(n_digests)
    ])
    # digest materialized as a column BEFORE the aggregation: the n_hashes
    # min() children then reference a cheap attribute slice instead of each
    # re-inlining (and recomputing) the md5 chain
    hashed = toks.select("doc_id", digest.alias("_d"))
    return hashed.groupBy("doc_id").agg(*[
        F.min(F.substring("_d", 1 + 8 * s, 8)).alias(f"sig_{s}")
        for s in range(n_hashes)
    ])


def minhash_signatures(docs: DataFrame, n_hashes: int = N_MINHASH,
                       shingle: int | None = 3) -> DataFrame:
    """Long-form (doc_id, seed, sig) view of minhash_signatures_wide."""
    wide = minhash_signatures_wide(docs, n_hashes, shingle)
    entries = F.array(*[
        F.struct(F.lit(s).alias("seed"), F.col(f"sig_{s}").alias("sig"))
        for s in range(n_hashes)
    ])
    return (
        wide.select("doc_id", F.explode(entries).alias("p"))
        .select("doc_id", F.col("p.seed").alias("seed"), F.col("p.sig").alias("sig"))
    )


def minhash_lsh_pairs(docs: DataFrame, n_hashes: int = N_MINHASH,
                      band_size: int = LSH_BAND_SIZE,
                      shingle: int | None = 3) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any full LSH band bucket.

    Bands are assembled column-wise from the wide signatures (band b =
    seeds [b*band_size, ...)) — the bucket string is byte-identical to the
    previous collect_list form and to the SQL oracle's ordered string_agg.
    The only shuffles left are the band-bucket self-join's."""
    wide = minhash_signatures_wide(docs, n_hashes, shingle)
    band_structs = []
    for band_id in range(0, (n_hashes + band_size - 1) // band_size):
        seeds = range(band_id * band_size, min((band_id + 1) * band_size, n_hashes))
        entries = F.sort_array(F.array(*[
            F.concat_ws("=", F.lit(s), F.col(f"sig_{s}")) for s in seeds
        ]))
        band_structs.append(F.struct(
            F.lit(band_id).alias("band"), F.concat_ws("|", entries).alias("bucket")
        ))
    bands = (
        wide.select("doc_id", F.explode(F.array(*band_structs)).alias("bb"))
        .select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(docs: DataFrame, n_bits: int = 64) -> DataFrame:
    """64-bit SimHash: per-bit majority vote over xxhash64(token).

    Pure built-ins: explode tokens -> bit_get -> conditional sum -> bitwise
    re-assembly. No DuckDB-portable twin (xxhash64) -> rows-only check.
    """
    toks = doc_tokens(docs).withColumn("h", F.xxhash64("token"))
    bits = toks.select(
        "doc_id", "h",
        F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("bit"),
    )
    votes = bits.groupBy("doc_id", "bit").agg(
        F.sum(
            F.when(F.bit_get("h", F.col("bit")) == 1, 1).otherwise(-1)
        ).alias("vote")
    )
    bit_value = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("vote") > 0, bit_value).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup candidates: same 16-bit simhash band, hamming <= max_hamming."""
    sh = simhash(docs)
    banded = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(i),
                        F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)))
            for i in range(4)
        ])).alias("band_key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
