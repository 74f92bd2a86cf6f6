"""Mention detection over exploded document spans.

Two interchangeable implementations with identical output:

  * ``arrow``  — a vectorized pandas UDF doing batched regex extraction
    (the north_star's "batched mention detection via Arrow UDFs"); regexes
    are compiled once per Python worker, mirroring the reference's hoisted
    regex compilation (permission_relationships.py:227-243).
  * ``native`` — pure ``pyspark.sql.functions`` (regexp/split/explode),
    fully inside whole-stage codegen.  This is the default: at 10^12 docs
    the JVM path avoids Arrow transfer entirely.  The Arrow path exists to
    host genuinely Python-only matchers (model-based NER, etc.) behind the
    same contract, and tests assert both paths agree.

Output columns: doc_id, span_idx, offset, mention (the token),
mention_kind ('arn' | 'email').
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Identifier grammar shared by both paths (and by the DuckDB oracle):
# a mention is a whitespace-delimited token that either starts with "arn:"
# or contains "@" (emails in this corpus are space-delimited, no trailing
# punctuation by construction of the synthesizer).
_ARN_PREFIX = "arn:"


def _classify(tok_col):
    return (
        F.when(tok_col.startswith(_ARN_PREFIX), F.lit("arn"))
        .when(tok_col.contains("@"), F.lit("email"))
        .otherwise(F.lit(None))
    )


def detect_mentions_native(spans: DataFrame) -> DataFrame:
    """JVM-side tokenizer: split -> explode -> classify."""
    text_spans = spans.where(F.col("kind") == "text").where(F.col("text").isNotNull())
    toks = text_spans.select(
        "doc_id",
        "span_idx",
        "offset",
        F.explode(F.split(F.col("text"), " ")).alias("mention"),
    )
    return (
        toks.withColumn("mention_kind", _classify(F.col("mention")))
        .where(F.col("mention_kind").isNotNull())
        .select("doc_id", "span_idx", "offset", "mention", "mention_kind")
    )


def detect_mentions_arrow(spans: DataFrame) -> DataFrame:
    """Arrow-batched extractor: one pandas UDF call per record batch.

    Emits an array of (mention, kind) structs per span, exploded JVM-side —
    so the Python boundary is crossed once per batch, never per row/token.
    """
    import pyspark.sql.types as T

    out_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("mention", T.StringType()),
                T.StructField("mention_kind", T.StringType()),
            ]
        )
    )

    @F.pandas_udf(out_type)
    def extract_batch(texts: pd.Series) -> pd.Series:
        import re

        # compiled once per worker process (module-level caching via closure)
        tok_re = re.compile(r"\S+")

        def one(text):
            if text is None:
                return []
            out = []
            for m in tok_re.finditer(text):
                tok = m.group(0)
                if tok.startswith("arn:"):
                    out.append((tok, "arn"))
                elif "@" in tok:
                    out.append((tok, "email"))
            return out

        return texts.map(one)

    text_spans = spans.where(F.col("kind") == "text").where(F.col("text").isNotNull())
    return (
        text_spans.select(
            "doc_id", "span_idx", "offset", extract_batch("text").alias("ms")
        )
        .select("doc_id", "span_idx", "offset", F.explode("ms").alias("m"))
        .select(
            "doc_id",
            "span_idx",
            "offset",
            F.col("m.mention").alias("mention"),
            F.col("m.mention_kind").alias("mention_kind"),
        )
    )


def detect_mentions(spans: DataFrame, impl: str = "native") -> DataFrame:
    if impl == "arrow":
        return detect_mentions_arrow(spans)
    return detect_mentions_native(spans)
