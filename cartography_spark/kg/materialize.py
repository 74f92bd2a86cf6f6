"""Document-graph materialization: Document nodes + MENTIONS edges.

The documents path (north_star): exploded spans -> mention detection ->
entity linking -> canonicalization -> deterministic edge materialization.
Edges carry the provenance the reference stamps on every element
(firstseen/lastupdated) plus the span position, so the span-sequence
invariant is auditable from the graph itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cartography_spark.core.store import GraphStore
from cartography_spark.kg.canonicalize import canonical_mapping
from cartography_spark.kg.extract import detect_mentions
from cartography_spark.kg.link import identifier_dictionary, link_mentions
from cartography_spark.sources.docs_synth import exploded_spans


def document_nodes(docs: DataFrame, update_tag: int) -> DataFrame:
    return docs.select(
        F.col("doc_id").alias("id"),
        F.lit("Document").alias("label"),
        F.map_from_arrays(
            F.array(F.lit("n_spans")),
            F.array(F.size("spans").cast("string")),
        ).alias("props"),
        F.lit(None).cast("array<string>").alias("extra_labels"),
        F.lit(None).cast("long").alias("firstseen"),
        F.lit(int(update_tag)).alias("lastupdated"),
    )


def mention_edges(
    docs: DataFrame,
    nodes: DataFrame,
    update_tag: int,
    impl: str = "native",
) -> DataFrame:
    """(Document)-[:MENTIONS]->(canonical entity) with span provenance.

    Canonicalization rewrites each linked entity to its component
    representative before the edge is emitted, so duplicate identities
    (AWSUser + OktaUser sharing an email) produce ONE canonical endpoint.
    Edge props keep mention count and first span index per (doc, entity).
    """
    spans = exploded_spans(docs)
    mentions = detect_mentions(spans, impl=impl)
    dims = identifier_dictionary(nodes)
    links = link_mentions(mentions, dims)

    canon = canonical_mapping(nodes)
    links = (
        links.join(canon, links["entity_id"] == canon["node_id"], "left")
        .withColumn("canonical", F.coalesce("canonical_id", "entity_id"))
        .drop("node_id", "canonical_id")
    )
    # The canonical node's label (it may differ from the matched node's).
    labels = nodes.select(F.col("id").alias("canonical"), F.col("label").alias("canon_label"))
    links = links.join(labels, "canonical", "left")

    return (
        links.groupBy("doc_id", "canonical", "canon_label")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.min("span_idx").alias("first_span_idx"),
            F.max("score").alias("score"),
        )
        .select(
            F.col("doc_id").alias("src_id"),
            F.lit("Document").alias("src_label"),
            F.lit("MENTIONS").alias("rel_label"),
            F.col("canonical").alias("dst_id"),
            F.coalesce("canon_label", F.lit("Entity")).alias("dst_label"),
            F.map_from_arrays(
                F.array(F.lit("n_mentions"), F.lit("first_span_idx"), F.lit("score")),
                F.array(
                    F.col("n_mentions").cast("string"),
                    F.col("first_span_idx").cast("string"),
                    F.col("score").cast("string"),
                ),
            ).alias("props"),
            F.lit(None).cast("long").alias("firstseen"),
            F.lit(int(update_tag)).alias("lastupdated"),
        )
    )


def sync_documents(
    store: GraphStore, docs: DataFrame, update_tag: int, impl: str = "native"
) -> None:
    stage = "documents:mentions"
    if store.stage_done(stage, update_tag):
        return
    nodes = document_nodes(docs, update_tag)
    edges = mention_edges(docs, store.nodes(), update_tag, impl=impl)
    store.upsert(nodes, edges, stage, update_tag)
