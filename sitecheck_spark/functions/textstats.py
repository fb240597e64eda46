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
    """Occurrences of any wl-member in a MATERIALIZED word-array column.

    Callers must bind words_col(...) to a real column first (one
    withColumn): feeding the expression in directly inlines the
    regexp_extract_all subtree into every filter below — one regex pass per
    dictionary word per row (operators/dedup._bound_words has the 17x
    measurement of the same hazard)."""
    c = F.lit(0)
    for w in wl:
        c = c + F.size(F.filter(words, lambda t: t == F.lit(w)))
    return c


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: argmax of per-language stopword counts.

    Ties resolve en > de > fr (strictly-greater comparisons), 'und' when all
    votes are zero — the exact same rule ships in the SQL oracle.
    """
    d = df.withColumn("_words", words_col(text_col))
    w = F.col("_words")
    en = _count_in(w, EN_STOPWORDS)
    de = _count_in(w, DE_STOPWORDS)
    fr = _count_in(w, FR_STOPWORDS)
    pred = (
        F.when((en >= de) & (en >= fr) & (en > 0), "en")
        .when((de >= fr) & (de > 0), "de")
        .when(fr > 0, "fr")
        .otherwise("und")
    )
    return d.withColumn("pred_lang", pred).drop("_words")


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


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercase text. (The exact-dedup key; md5 is identical across engines.)"""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    return df.withColumn("fingerprint", F.md5(norm))
