"""GCP module: projects + compute instances.

Proves the schema compiler generalizes beyond AWS naming: a non-AWS
sub-resource (GCPProject instead of AWSAccount) anchors the RESOURCE edge.

Parity map (reference cartography/intel/gcp/):
  * projects (crm.py:96-123)      — GCPProject{id: projectid}
  * instances (compute.py:183-221) — GCPInstance{id: partial_uri self-link},
    (GCPProject)-[:RESOURCE]->(GCPInstance)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cartography_spark.core.loader import compile_edges, compile_nodes
from cartography_spark.core.model import (
    LinkDirection,
    NodeSchema,
    PropertyRef,
    RelSchema,
    TargetNodeMatcher,
)
from cartography_spark.core.store import GraphStore

GCP_PROJECT_SCHEMA = NodeSchema(
    label="GCPProject",
    id=PropertyRef("project_id"),
    properties={"displayname": PropertyRef("display_name")},
)

GCP_INSTANCE_SCHEMA = NodeSchema(
    label="GCPInstance",
    id=PropertyRef("instance_id"),
    properties={"name": PropertyRef("name"), "zone": PropertyRef("zone")},
    sub_resource_rel=RelSchema(
        target_label="GCPProject",
        rel_label="RESOURCE",
        direction=LinkDirection.INWARD,
        matcher=TargetNodeMatcher({"id": PropertyRef("project_id")}),
    ),
)


def sync_gcp(
    store: GraphStore, projects: DataFrame, instances: DataFrame, update_tag: int
) -> None:
    if not store.stage_done("gcp:projects", update_tag):
        store.upsert(
            compile_nodes(projects, GCP_PROJECT_SCHEMA, update_tag),
            None,
            "gcp:projects",
            update_tag,
        )
    if not store.stage_done("gcp:instances", update_tag):
        store.upsert(
            compile_nodes(instances, GCP_INSTANCE_SCHEMA, update_tag),
            compile_edges(instances, GCP_INSTANCE_SCHEMA, store.nodes(), update_tag),
            "gcp:instances",
            update_tag,
        )
