"""Text-analysis operators for large-scale training-data pipelines.

All built from JVM-side pyspark.sql.functions (whole-stage codegen, no
Python in the hot path): language-ID heuristic, quality scoring, token
counting, document fingerprinting. Each has a DuckDB-expressible twin in
__spark_entry__.oracle_sql so the driver value-checks them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny stopword lists for the n-gram/stopword language heuristic. Deliberately
# small + ASCII so the same rule is trivially expressible in ANSI SQL.
EN_STOPWORDS = ["the", "and", "of", "to", "a"]
DE_STOPWORDS = ["der", "die", "und", "das"]
FR_STOPWORDS = ["le", "la", "les", "et"]

WORD_RE = "[a-z]+"
# BPE-ish subword splitter: runs of letters, runs of digits, or single
# non-alphanumeric non-space marks — a cheap proxy for tokenizer cost.
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def words_col(text: Column | str) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(WORD_RE), F.lit(0))


def _count_in(words: Column, wl: list[str]) -> Column:
    """Occurrences of any wl-member in a MATERIALIZED word-array column,
    in ONE traversal: aggregate with a per-element membership test (In over
    a handful of literals) instead of one filter() pass per dictionary word
    — higher-order functions run interpreted, so len(wl) separate array
    traversals cost len(wl) lambda invocations per element (lang_id ran
    13 such passes per row; see OPTIMIZATION_r07.md for the measurement).

    Callers must bind words_col(...) to a real column first (one
    withColumn): feeding the expression in directly inlines the
    regexp_extract_all subtree into the lambda below — one regex pass per
    row per traversal (operators/dedup._bound_words has the 17x
    measurement of the same hazard)."""
    return F.aggregate(
        words, F.lit(0),
        lambda acc, t: acc + F.when(t.isin(wl), 1).otherwise(0),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: argmax of per-language stopword counts.

    Ties resolve en > de > fr (strictly-greater comparisons), 'und' when all
    votes are zero — the exact same rule ships in the SQL oracle.

    All three languages' votes accumulate in ONE array traversal (struct
    accumulator), and the votes struct is materialized as a column before
    the argmax CASE references its fields repeatedly — each reference is
    then an attribute slice, not a re-run of the aggregate."""
    d = df.withColumn("_words", words_col(text_col))
    votes = F.aggregate(
        F.col("_words"),
        F.struct(F.lit(0).alias("en"), F.lit(0).alias("de"),
                 F.lit(0).alias("fr")),
        lambda acc, t: F.struct(
            (acc["en"] + F.when(t.isin(EN_STOPWORDS), 1).otherwise(0)).alias("en"),
            (acc["de"] + F.when(t.isin(DE_STOPWORDS), 1).otherwise(0)).alias("de"),
            (acc["fr"] + F.when(t.isin(FR_STOPWORDS), 1).otherwise(0)).alias("fr"),
        ),
    )
    d = d.withColumn("_v", votes)
    en, de, fr = F.col("_v.en"), F.col("_v.de"), F.col("_v.fr")
    pred = (
        F.when((en >= de) & (en >= fr) & (en > 0), "en")
        .when((de >= fr) & (de > 0), "de")
        .when(fr > 0, "fr")
        .otherwise("und")
    )
    return d.withColumn("pred_lang", pred).drop("_words", "_v")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features.

    Ratios are single divisions of exact integer counts — bit-identical
    across engines.
    """
    text = F.col(text_col)
    d = df.withColumn("_words", words_col(text_col))
    words = F.col("_words")
    n_words = F.size(words)
    n_chars = F.length(text)
    n_punct = F.size(F.regexp_extract_all(text, F.lit("[.,;:!?]"), F.lit(0)))
    n_stop = _count_in(words, EN_STOPWORDS)
    return (
        d.withColumn("n_words", n_words)
        .withColumn("n_chars_measured", n_chars)
        .withColumn("n_punct", n_punct)
        .withColumn("n_stopwords", n_stop)
        .withColumn(
            "stopword_ratio",
            F.when(n_words > 0, n_stop.cast("double") / n_words.cast("double")),
        )
        .withColumn(
            "avg_word_len",
            F.when(
                n_words > 0,
                F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)).cast("double")
                / n_words.cast("double"),
            ),
        )
        .drop("_words")
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-token and BPE-ish-token counts (training-cost estimation)."""
    text = F.col(text_col)
    ws = F.size(F.split(F.trim(text), "\\s+"))
    bpe = F.size(F.regexp_extract_all(text, F.lit(BPE_RE), F.lit(0)))
    return df.withColumn("n_ws_tokens", ws).withColumn("n_bpe_tokens", bpe)


def repetition_features(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Gopher/C4-style repetition features + keep verdict per document —
    the standard pre-training quality gate (repetitious docs are boilerplate
    / spam / scraped nav chrome).

    Features (exact integer-count ratios, bit-identical across engines):
      dup_word_ratio    1 - distinct_words / n_words
      top_word_ratio    occurrences of the most frequent word / n_words
      top_bigram_ratio  occurrences of the most frequent adjacent pair /
                        (n_words - 1)
      keep              the filter verdict: n_words in [10, 100000] and
                        top_word_ratio <= 0.20 and top_bigram_ratio <= 0.18
                        (Gopher-flavored thresholds; tune per corpus)
    Ties for "most frequent" resolve to the lexicographically smallest
    word/bigram — min over (-count, token) — so the argmax is total and the
    DuckDB oracle reproduces it exactly.

    Plan shape at scale: the text is tokenized ONCE — words and bigrams
    are tagged structs in one combined array, so one explode feeds two
    partial-aggregated shuffles keyed by (doc, tag, token) and doc (the
    dedup tier's bounded-fan-out shape), and the word/bigram features
    come out of a single conditional aggregation with no join. Nothing is
    per-row Python; no token list ever gathers beyond its own document
    group. Documents with < 2 words have NULL top_bigram_* (no bigrams
    exist) and keep = false (below the word floor)."""
    d = df.select(id_col, words_col(text_col).alias("_w"))
    d = d.withColumn(
        "_bg",
        # bigrams by zipping the array against its own 1-shift: no
        # conditional, no index arithmetic. (A CASE WHEN size(_w)>=2 guard
        # around a transform(sequence(...), _w[i]) variant re-evaluated
        # the tokenizer regex per element — 10.5 s vs 2.4 s at sf0.1 —
        # and unguarded sequence(0, size-2) counts DOWN on short arrays
        # under ANSI and throws. slice(_, _, 0) is just empty.)
        F.expr("zip_with(slice(_w, 1, greatest(size(_w) - 1, 0)), "
               "slice(_w, 2, greatest(size(_w) - 1, 0)), "
               "(a, b) -> concat(a, ' ', b))"),
    )
    # one exploded stream of tagged tokens; explode_outer keeps zero-word
    # docs as a single null row so they survive to the output
    tagged = d.select(
        id_col,
        F.explode_outer(
            F.expr("concat(transform(_w,  t -> struct(0 AS k, t AS v)), "
                   "transform(_bg, t -> struct(1 AS k, t AS v)))")
        ).alias("t"),
    ).select(id_col, F.col("t.k").alias("k"), F.col("t.v").alias("tok"))
    counts = tagged.groupBy(id_col, "k", "tok").agg(
        F.count("tok").alias("cnt")
    )
    is_w = F.col("k") == 0
    is_b = F.col("k") == 1
    top_struct = F.struct((-F.col("cnt")).alias("nc"), F.col("tok").alias("t"))
    out = counts.groupBy(id_col).agg(
        F.coalesce(F.sum(F.when(is_w, F.col("cnt"))), F.lit(0))
        .alias("n_words"),
        F.count(F.when(is_w, F.col("tok"))).alias("n_distinct"),
        F.min(F.when(is_w, top_struct)).alias("_top"),
        F.sum(F.when(is_b, F.col("cnt"))).alias("_n_bigrams"),
        F.min(F.when(is_b, top_struct)).alias("_btop"),
    )
    n_words = F.col("n_words")
    top_ratio = (-F.col("_top.nc")).cast("double") / n_words.cast("double")
    btop_ratio = (
        (-F.col("_btop.nc")).cast("double") / F.col("_n_bigrams").cast("double")
    )
    return out.select(
        id_col,
        "n_words",
        "n_distinct",
        F.when(n_words > 0,
               F.lit(1.0) - F.col("n_distinct").cast("double")
               / n_words.cast("double")).alias("dup_word_ratio"),
        F.col("_top.t").alias("top_word"),
        F.when(n_words > 0, top_ratio).alias("top_word_ratio"),
        F.col("_btop.t").alias("top_bigram"),
        btop_ratio.alias("top_bigram_ratio"),
        (
            (n_words >= 10) & (n_words <= 100000)
            & (top_ratio <= 0.20) & (btop_ratio <= 0.18)
        ).alias("keep"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercase text. (The exact-dedup key; md5 is identical across engines.)"""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    return df.withColumn("fingerprint", F.md5(norm))
