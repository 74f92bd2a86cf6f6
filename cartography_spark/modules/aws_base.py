"""AWSAccount root nodes + shared helpers for AWS modules.

Parity: reference intel/aws/organizations.py loads AWSAccount nodes; every
asset schema declares its sub_resource_rel to AWSAccount
(models/core/nodes.py:71-84).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cartography_spark.core.loader import compile_nodes
from cartography_spark.core.model import (
    LinkDirection,
    NodeSchema,
    PropertyRef,
    RelSchema,
    TargetNodeMatcher,
)
from cartography_spark.core.store import GraphStore

ACCOUNT_SCHEMA = NodeSchema(
    label="AWSAccount",
    id=PropertyRef("id"),
    # inscope marks accounts the sync was CONFIGURED with (reference
    # intel/aws/__init__.py:283 sets inscope on every synced account);
    # accounts synthesized from trust-policy ARNs lack it, which is what the
    # aws_foreign_accounts analysis keys on.
    properties={"name": PropertyRef("name"), "inscope": PropertyRef("inscope", set_in_kwargs=True)},
)


def account_resource_rel() -> RelSchema:
    """The (AWSAccount)-[:RESOURCE]->(asset) tenancy edge every AWS asset
    declares (INWARD from the asset's point of view)."""
    return RelSchema(
        target_label="AWSAccount",
        rel_label="RESOURCE",
        direction=LinkDirection.INWARD,
        matcher=TargetNodeMatcher({"id": PropertyRef("account_id")}),
    )


def sync_accounts(store: GraphStore, accounts: DataFrame, update_tag: int) -> None:
    stage = "aws:accounts"
    if store.stage_done(stage, update_tag):
        return
    nodes = compile_nodes(accounts, ACCOUNT_SCHEMA, update_tag, {"inscope": "true"})
    store.upsert(nodes, None, stage, update_tag)
