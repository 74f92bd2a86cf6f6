"""TAGGED edges from resource-tag mappings.

Parity: cartography/intel/aws/resourcegroupstaggingapi.py — the reference
double-UNWINDs nested tag arrays (:151-168), maps each resource type to a
(label, match-property) pair (:66-116), and MERGEs
(resource)-[:TAGGED]->(:AWSTag{id: key+":"+value}).  Here the double UNWIND
is one ``explode`` and the per-type match is an equi-join against the node
table on id (we tag by full ARN; short-id extraction for ec2/s3 types is a
``regexp_extract`` in functions/arn.py, not per-row Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cartography_spark.core.loader import LabeledFrame
from cartography_spark.core.store import GraphStore

TYPE_TO_LABEL = {
    "emr": "EMRCluster",
    "s3": "S3Bucket",
    "iam:user": "AWSUser",
}


def sync_tags(store: GraphStore, tag_mappings: DataFrame, update_tag: int) -> None:
    stage = "aws:tags"
    if store.stage_done(stage, update_tag):
        return
    exploded = tag_mappings.select(
        "ResourceARN", "resource_type", F.explode("Tags").alias("t")
    ).select(
        "ResourceARN",
        "resource_type",
        F.col("t.Key").alias("key"),
        F.col("t.Value").alias("value"),
        F.concat(F.col("t.Key"), F.lit(":"), F.col("t.Value")).alias("tag_id"),
    )

    tag_nodes = exploded.select(
        F.col("tag_id").alias("id"),
        F.lit("AWSTag").alias("label"),
        F.map_from_arrays(
            F.array(F.lit("key"), F.lit("value")), F.array(F.col("key"), F.col("value"))
        ).alias("props"),
        F.lit(None).cast("array<string>").alias("extra_labels"),
        F.lit(None).cast("long").alias("firstseen"),
        F.lit(int(update_tag)).alias("lastupdated"),
    ).dropDuplicates(["id"])

    label_map = F.create_map(
        *[F.lit(x) for kv in TYPE_TO_LABEL.items() for x in kv]
    )
    typed = exploded.withColumn("res_label", F.element_at(label_map, F.col("resource_type")))

    # Only emit edges for resources that exist in the graph (the reference's
    # MATCH-by-(label, property) does the same by construction).  The join's
    # equality on res_label means only the mapped labels can ever match, so
    # the read prunes to exactly those slices.
    resources = store.nodes(labels=sorted(set(TYPE_TO_LABEL.values()))).select(
        F.col("id").alias("res_id"), F.col("label").alias("node_label")
    )
    edges = typed.join(
        resources,
        (typed["ResourceARN"] == resources["res_id"])
        & (typed["res_label"] == resources["node_label"]),
        "inner",
    ).select(
        F.col("res_id").alias("src_id"),
        F.col("node_label").alias("src_label"),
        F.lit("TAGGED").alias("rel_label"),
        F.col("tag_id").alias("dst_id"),
        F.lit("AWSTag").alias("dst_label"),
        F.lit(None).cast("map<string,string>").alias("props"),
        F.lit(None).cast("long").alias("firstseen"),
        F.lit(int(update_tag)).alias("lastupdated"),
    ).dropDuplicates(["src_id", "rel_label", "dst_id"])

    store.upsert(
        LabeledFrame(tag_nodes, ["AWSTag"]),
        LabeledFrame(edges, ["TAGGED"]),
        stage,
        update_tag,
    )
