"""Sequence packing — fixed-length training-example construction.

The last step of a pre-training data pipeline: concatenate each stream's
documents in a deterministic order and chunk the token stream into
max_len-sized training rows. Greedy bin packing is inherently sequential;
the scalable formulation is offset arithmetic: a running token-count sum
gives every document its global [start, end) span in its stream, and the
bins it lands in are pure integer division on that span — no sequential
state, no driver loop, one window over (stream, order).

Plan shape at scale: ONE shuffle+sort keyed by the stream column (the
window), then a codegen'd projection and an explode bounded by
ceil(doc_tokens / max_len) — output rows are O(total_tokens / max_len +
n_docs). Streams are independent, so parallelism = number of streams ×
nothing serial; pick the stream key (e.g. a hash bucket of doc_id) to
give each window partition a bounded token budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    stream_col: str,
    order_col: str,
    n_tokens_col: str,
    max_len: int,
) -> DataFrame:
    """Chunk each stream's ordered token concatenation into max_len bins.

    Output: one row per (document, bin it occupies) —
      stream, order, bin            bin = 0-based index within the stream
      doc_tok_start, doc_tok_end    the doc's token slice [start, end)
                                    placed in this bin (doc-relative)
      bin_tok_start                 where that slice begins inside the bin
    A document spanning k boundaries emits k+1 rows (standard
    concat-then-chunk packing: no padding waste, documents split at bin
    edges). Zero-token documents emit nothing. Deterministic for any
    (stream, order) total order; the caller supplies both (e.g. stream =
    pmod(hash(doc_id), n_streams), order = doc_id).
    """
    w = Window.partitionBy(stream_col).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n = F.col(n_tokens_col).cast("long")
    d = (
        df.withColumn("_end", F.sum(n).over(w))
        .withColumn("_start", F.col("_end") - n)
        .filter(n > 0)
    )
    first_bin = (F.col("_start") / max_len).cast("long")
    last_bin = ((F.col("_end") - 1) / max_len).cast("long")
    d = d.withColumn("_bin", F.explode(F.sequence(first_bin, last_bin)))
    bin_start = F.col("_bin") * max_len
    bin_end = bin_start + max_len
    return d.select(
        F.col(stream_col).alias("stream"),
        F.col(order_col).alias("order"),
        F.col("_bin").alias("bin"),
        (F.greatest(F.col("_start"), bin_start) - F.col("_start"))
        .alias("doc_tok_start"),
        (F.least(F.col("_end"), bin_end) - F.col("_start"))
        .alias("doc_tok_end"),
        (F.greatest(F.col("_start"), bin_start) - bin_start)
        .alias("bin_tok_start"),
    )
