"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All JVM-native columns (no UDFs) — these run over every document at
10^12-doc scale, so they must stay inside whole-stage codegen.  Each
function is mirrored by an ANSI-SQL oracle in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic stopword marker set for the language-ID heuristic.
EN_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]


def with_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("tokens", F.split(F.col(text_col), " +"))


def token_stats(docs: DataFrame) -> DataFrame:
    """doc_id, n_tokens, n_chars, avg_token_len (4dp)."""
    t = with_tokens(docs)
    return t.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size("tokens").cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.round(
            F.aggregate("tokens", F.lit(0.0), lambda acc, x: acc + F.length(x))
            / F.size("tokens"),
            4,
        ).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / stopword-ratio quality heuristics (cf. C4/Gopher-style
    rules).  doc_id, n_tokens, stopword_ratio, uniq_token_ratio, quality_ok."""
    t = with_tokens(docs)
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    out = t.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size("tokens").cast("long").alias("n_tokens"),
        F.round(
            F.size(F.filter("tokens", lambda x: F.array_contains(sw, x)))
            / F.size("tokens").cast("double"),
            4,
        ).alias("stopword_ratio"),
        F.round(
            F.size(F.array_distinct("tokens")) / F.size("tokens").cast("double"), 4
        ).alias("uniq_token_ratio"),
    )
    return out.withColumn(
        "quality_ok",
        (F.col("n_tokens") >= 5)
        & (F.col("stopword_ratio") >= 0.01)
        & (F.col("uniq_token_ratio") >= 0.2),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """n-gram/stopword language heuristic: doc_id, en_score, pred_lang.

    (The corpus is synthetic so the heuristic, not its accuracy, is what the
    oracle checks.)"""
    t = with_tokens(docs)
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    score = F.round(
        F.size(F.filter("tokens", lambda x: F.array_contains(sw, x)))
        / F.size("tokens").cast("double"),
        4,
    )
    return t.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        score.alias("en_score"),
    ).withColumn(
        "pred_lang", F.when(F.col("en_score") > 0.05, F.lit("en")).otherwise(F.lit("unk"))
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition screens (Rae et al. 2021, app. A1.1): the
    most repetitive web documents are boilerplate/spam; flag docs whose
    single most frequent token or adjacent bigram covers too much of the
    text.

    doc_id, n_tokens, top_token_fraction, top_bigram_fraction, repetition_ok.

    All JVM-native higher-order functions, zero shuffle: the per-row
    O(distinct × n) scan beats explode + groupBy + window (which shuffles
    10^12 × doc_len rows) for bounded doc lengths.  For book-length docs
    swap in the explode variant — the flag semantics are identical.
    """
    t = with_tokens(docs)
    nb = "greatest(size(tokens) - 1, 0)"
    t = t.withColumn(
        "bigrams",
        F.expr(
            f"zip_with(slice(tokens, 1, {nb}), slice(tokens, 2, {nb}),"
            " (a, b) -> concat(a, ' ', b))"
        ),
    )

    def top_frac(col: str) -> F.Column:
        return F.round(
            F.array_max(
                F.expr(f"transform(array_distinct({col}), t -> size(filter({col}, x -> x = t)))")
            )
            / F.size(col).cast("double"),
            4,
        )

    out = t.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size("tokens").cast("long").alias("n_tokens"),
        top_frac("tokens").alias("top_token_fraction"),
        F.when(F.size("bigrams") > 0, top_frac("bigrams"))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_fraction"),
    )
    return out.withColumn(
        "repetition_ok",
        (F.col("top_token_fraction") <= 0.2) & (F.col("top_bigram_fraction") <= 0.18),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprints:
    * content_fp — md5 of whitespace-normalized lowercased text (exact dup key)
    * shingle_fp — md5 of the sorted distinct token set (order-insensitive)
    * prefix_fp  — md5 of the first 64 chars (cheap near-dup blocking key)
    """
    t = with_tokens(docs.withColumn("norm", F.lower(F.regexp_replace("text", " +", " "))))
    return t.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5("norm").alias("content_fp"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(F.split(F.col("norm"), " "))))).alias(
            "shingle_fp"
        ),
        F.md5(F.substring("text", 1, 64)).alias("prefix_fp"),
    )


# PII patterns shared by redact_pii and its DuckDB oracle: RE2/Java-regex
# portable (no lookaround, no \b), so BOTH engines match identical spans.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("arn", r"arn:[a-z0-9-]+:[a-z0-9-]*:[a-z0-9-]*:[0-9]*:[A-Za-z0-9/:._-]+", "<ARN>"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data PII screen: count and redact emails / resource ARNs.

    Adds ``n_<kind>s`` counts (regexp_count, JVM-native) and ``clean`` (the
    text with every match replaced by its placeholder).  Order matters and
    is fixed: emails first (an ARN never contains '@', so the passes are
    independent on real text, but a fixed order keeps both engines and
    re-runs byte-identical).  Zero shuffle — pure per-row codegen, the only
    shape that survives 10^12 documents.
    """
    out = df
    for name, pat, _ in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}s", F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        )
    clean = F.col(text_col)
    for _, pat, tok in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, tok)
    return out.withColumn("clean", clean)
