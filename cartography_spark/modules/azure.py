"""Azure module: subscriptions + virtual machines.

Second non-AWS provider (with modules/gcp.py) — Azure's id grammar is
path-style resource URIs, exercising the schema compiler on yet another
naming scheme.

Parity map (reference cartography/intel/azure/):
  * subscriptions (subscription.py:63-81) — AzureSubscription{id}
  * virtual machines (compute.py:84-132) — AzureVirtualMachine{id: resource
    URI}, (AzureSubscription)-[:RESOURCE]->(AzureVirtualMachine)
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

AZURE_SUBSCRIPTION_SCHEMA = NodeSchema(
    label="AzureSubscription",
    id=PropertyRef("subscription_id"),
    properties={"name": PropertyRef("name")},
)

AZURE_VM_SCHEMA = NodeSchema(
    label="AzureVirtualMachine",
    id=PropertyRef("vm_id"),
    properties={"name": PropertyRef("name"), "location": PropertyRef("location")},
    sub_resource_rel=RelSchema(
        target_label="AzureSubscription",
        rel_label="RESOURCE",
        direction=LinkDirection.INWARD,
        matcher=TargetNodeMatcher({"id": PropertyRef("subscription_id")}),
    ),
)


def sync_azure(
    store: GraphStore, subscriptions: DataFrame, vms: DataFrame, update_tag: int
) -> None:
    if not store.stage_done("azure:subscriptions", update_tag):
        store.upsert(
            compile_nodes(subscriptions, AZURE_SUBSCRIPTION_SCHEMA, update_tag),
            None,
            "azure:subscriptions",
            update_tag,
        )
    if not store.stage_done("azure:vms", update_tag):
        store.upsert(
            compile_nodes(vms, AZURE_VM_SCHEMA, update_tag),
            compile_edges(vms, AZURE_VM_SCHEMA, store.nodes(), update_tag),
            "azure:vms",
            update_tag,
        )
