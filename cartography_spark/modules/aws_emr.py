"""EMR module — the reference's exemplar intel module.

Parity: cartography/intel/aws/emr.py:78-98 (sync = get, transform, load,
cleanup) with the node model at cartography/models/aws/emr.py:14-36 and the
integration expectations at tests/integration/cartography/intel/aws/test_emr.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cartography_spark.core.cleanup import cleanup_schema
from cartography_spark.core.loader import compile_edges, compile_nodes
from cartography_spark.core.model import NodeSchema, PropertyRef
from cartography_spark.core.store import GraphStore
from cartography_spark.modules.aws_base import account_resource_rel

EMR_CLUSTER_SCHEMA = NodeSchema(
    label="EMRCluster",
    id=PropertyRef("ClusterArn"),
    properties={
        "emr_id": PropertyRef("Id", extra_index=True),
        "name": PropertyRef("Name"),
        "servicerole": PropertyRef("ServiceRole"),
        "termination_protected": PropertyRef("TerminationProtected"),
        "release_label": PropertyRef("ReleaseLabel"),
        "region": PropertyRef("region"),
        "account_id": PropertyRef("account_id"),
    },
    sub_resource_rel=account_resource_rel(),
)


def sync_emr(store: GraphStore, clusters: DataFrame, update_tag: int) -> None:
    stage = "aws:emr"
    if store.stage_done(stage, update_tag):
        return
    nodes = compile_nodes(clusters, EMR_CLUSTER_SCHEMA, update_tag)
    edges = compile_edges(clusters, EMR_CLUSTER_SCHEMA, store.nodes, update_tag)
    store.upsert(nodes, edges, stage, update_tag)


def cleanup_emr(store: GraphStore, update_tag: int, account_id: str) -> None:
    cleanup_schema(store, EMR_CLUSTER_SCHEMA, update_tag, account_id)
