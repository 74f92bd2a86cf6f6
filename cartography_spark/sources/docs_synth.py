"""Interleaved text+media document synthesis (BASELINE.json input_hint).

Builds the pipeline's primary input — an Iceberg-shaped table

    (doc_id: string, spans: array<struct<kind string, text string,
                                         media_ref string, offset int>>)

— deterministically from the driver's flat ``documents`` parquet plus the
customer/supplier dimensions (entity mentions are woven into text spans so
the extract->link->canonicalize stages have ground truth).  Every formula is
modular arithmetic + concat and therefore reproducible in the DuckDB oracle.

Span layout per doc (offset strictly increasing == the per-row invariant):
  0  text   "doc intro " + first 64 chars of the source text
  1  text   mention of user arn + email   (custkey = doc_id % n_customers)
  2  image  s3://media/doc-{id}/frame-0.png          (only when doc_id%3==0)
  3  text   mention of EMR cluster arn    (suppkey = doc_id % n_suppliers)
  4  audio  s3://media/doc-{id}/audio.wav            (only when doc_id%5==0)

At 10^12-doc scale this module is replaced by the real Iceberg scan; the
synthesis is itself fully distributed (no driver-side loops — the dimension
counts are 1-row broadcast joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cartography_spark.sources.fixtures import _acct, plan_memo, read_table

SPAN_TYPE = "struct<kind:string,text:string,media_ref:string,offset:int>"


@plan_memo
def interleaved_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id string, spans array<struct<kind,text,media_ref,offset>>)."""
    # spread the doc scan: the whole downstream mention pipeline (span
    # explode, tokenize, broadcast dictionary join) is narrow until the
    # first groupBy, and a single-file documents table is one scan split —
    # without this the pipeline runs on one core (core/partition.py)
    from cartography_spark.core.partition import spread_partitions

    d = spread_partitions(read_table(spark, sf_dir, "documents"))
    counts = (
        read_table(spark, sf_dir, "customer")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .crossJoin(read_table(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("n_supp")))
    )
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_nationkey")
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey"), F.col("s_nationkey")
    )

    base = d.crossJoin(F.broadcast(counts))
    base = base.join(
        F.broadcast(cust), (base["doc_id"] % base["n_cust"]) == cust["c_custkey"], "inner"
    )
    base = base.join(
        F.broadcast(supp), (base["doc_id"] % base["n_supp"]) == supp["s_suppkey"], "inner"
    )

    ck = F.col("c_custkey").cast("string")
    cn = F.col("c_nationkey").cast("string")
    sk = F.col("s_suppkey").cast("string")

    def span(kind, text, media, off):
        return F.struct(
            F.lit(kind).alias("kind"),
            text.alias("text") if text is not None else F.lit(None).cast("string").alias("text"),
            media.alias("media_ref")
            if media is not None
            else F.lit(None).cast("string").alias("media_ref"),
            F.lit(off).cast("int").alias("offset"),
        )

    s0 = span("text", F.concat(F.lit("doc intro "), F.substring(F.col("text"), 1, 64)), None, 0)
    s1 = span(
        "text",
        F.concat(
            F.lit("touched by arn:aws:iam::"), _acct(F.col("c_nationkey")),
            F.lit(":user/user-"), ck,
            F.lit(" contact user-"), ck, F.lit("@corp-"), cn, F.lit(".example.com"),
        ),
        None,
        1,
    )
    s2 = span(
        "image",
        None,
        F.concat(F.lit("s3://media/doc-"), F.col("doc_id").cast("string"), F.lit("/frame-0.png")),
        2,
    )
    s3 = span(
        "text",
        F.concat(
            F.lit("ran on arn:aws:elasticmapreduce:us-east-1:"), _acct(F.col("s_nationkey")),
            F.lit(":cluster/j-"), sk,
        ),
        None,
        3,
    )
    s4 = span(
        "audio",
        None,
        F.concat(F.lit("s3://media/doc-"), F.col("doc_id").cast("string"), F.lit("/audio.wav")),
        4,
    )

    null_span = F.lit(None).cast(SPAN_TYPE)
    spans = F.array_compact(
        F.array(
            s0,
            s1,
            F.when((F.col("doc_id") % 3) == 0, s2).otherwise(null_span),
            s3,
            F.when((F.col("doc_id") % 5) == 0, s4).otherwise(null_span),
        )
    )

    return base.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("doc_id"),
        spans.alias("spans"),
    )


def exploded_spans(docs: DataFrame) -> DataFrame:
    """posexplode preserving span order — the invariant-carrying frame.

    Columns: doc_id, span_idx (position), kind, text, media_ref, offset.
    Every downstream stage carries (doc_id, span_idx) so a final
    re-aggregation can prove span-sequence equality.
    """
    return docs.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        F.col("span_idx").cast("int").alias("span_idx"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
