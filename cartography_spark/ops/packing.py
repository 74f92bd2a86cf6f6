"""Sequence packing for LLM training-data pipelines.

Training jobs consume fixed-length token sequences; the standard packing
scheme (GPT-style) concatenates documents in a deterministic order and
cuts the token stream every ``seq_len`` tokens, letting document
boundaries fall inside sequences.  The pipeline-side artifact is the
per-document placement — which sequence a document starts in and at what
offset — plus per-stream fill statistics.

All computation is one window per packing stream (``part_col``): a shuffle
by stream key, a sort within, then pure map-side arithmetic — the layout a
range-sorted 10^12-row corpus already has.  Placement is a pure function
of (stream, order, token counts), so a resumed or re-partitioned job
re-derives byte-identical packing (same property as ops/sampling.py).

For a corpus dominated by ONE stream value the single sorted partition
becomes the bottleneck; pre-shard such streams deterministically (e.g.
``source || '#' || pmod(hash(doc_id), k)``) and accept the ≤ seq_len-1
tokens of padding waste per shard boundary — the trade documented by the
fill stats this module emits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    part_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document placement in the packed token stream.

    Returns (part_col, doc_id, n_tokens, cum_tokens, seq_first, seq_offset,
    n_seqs_spanned): the document's token count, the stream's running token
    total through this document, the sequence index its first token lands
    in, the offset inside that sequence, and how many sequences it spans.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # token count is defined for the degenerate rows a web corpus always
    # carries: NULL text and whitespace-only text both pack 0 tokens
    # (size(split(NULL)) is -1 and split('') is [''] — both wrong here).
    n_tok = (
        F.when(
            F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""), F.lit(0)
        )
        .otherwise(F.size(F.split(F.trim(F.col(text_col)), " +")))
        .cast("long")
    )
    t = docs.select(
        F.col(part_col),
        F.col(order_col).cast("long").alias("doc_id"),
        n_tok.alias("n_tokens"),
    )
    c = t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    start = F.col("cum_tokens") - F.col("n_tokens")
    seq_first = F.floor(start / seq_len).cast("long")
    seq_last = F.floor((F.col("cum_tokens") - 1) / seq_len).cast("long")
    return c.select(
        part_col,
        "doc_id",
        "n_tokens",
        "cum_tokens",
        seq_first.alias("seq_first"),
        (start % seq_len).cast("long").alias("seq_offset"),
        (seq_last - seq_first + 1).alias("n_seqs_spanned"),
    )


def pack_stats(
    docs: DataFrame,
    seq_len: int = 2048,
    part_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-stream packing yield: (part_col, n_docs, total_tokens,
    n_sequences, fill_ratio) where the final partial sequence is padded —
    the number a data engineer checks before paying for a training run."""
    placed = pack_sequences(docs, seq_len, part_col, order_col, text_col)
    agg = placed.groupBy(part_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    n_seq = F.ceil(F.col("total_tokens") / seq_len).cast("long")
    # a stream of only empty docs packs zero sequences: fill_ratio is a
    # defined 0.0, not a divide-by-zero NULL
    fill = F.when(
        n_seq > 0, F.round(F.col("total_tokens") / (n_seq * seq_len), 4)
    ).otherwise(F.lit(0.0))
    return agg.select(
        part_col,
        "n_docs",
        "total_tokens",
        n_seq.alias("n_sequences"),
        fill.alias("fill_ratio"),
    )
