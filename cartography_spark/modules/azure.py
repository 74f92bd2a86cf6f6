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


# --- storage + SQL families (reference storage.py, sql.py) -----------------

AZURE_STORAGE_ACCOUNT_SCHEMA = NodeSchema(
    label="AzureStorageAccount",
    id=PropertyRef("account_id"),
    properties={"name": PropertyRef("name")},
    sub_resource_rel=RelSchema(
        target_label="AzureSubscription",
        rel_label="RESOURCE",
        direction=LinkDirection.INWARD,
        matcher=TargetNodeMatcher({"id": PropertyRef("subscription_id")}),
    ),
)

AZURE_BLOB_SERVICE_SCHEMA = NodeSchema(
    label="AzureStorageBlobService",
    id=PropertyRef("blob_service_id"),
    other_rels=(
        # (account)-[:USES]->(blob service), reference storage.py:367-373
        RelSchema(
            target_label="AzureStorageAccount",
            rel_label="USES",
            direction=LinkDirection.INWARD,
            matcher=TargetNodeMatcher({"id": PropertyRef("account_id")}),
        ),
    ),
)

AZURE_BLOB_CONTAINER_SCHEMA = NodeSchema(
    label="AzureStorageBlobContainer",
    id=PropertyRef("container_id"),
    properties={"name": PropertyRef("name"), "public_access": PropertyRef("public_access")},
    other_rels=(
        # (blob service)-[:CONTAINS]->(container), reference storage.py:540-560
        RelSchema(
            target_label="AzureStorageBlobService",
            rel_label="CONTAINS",
            direction=LinkDirection.INWARD,
            matcher=TargetNodeMatcher({"id": PropertyRef("blob_service_id")}),
        ),
    ),
)

AZURE_SQL_SERVER_SCHEMA = NodeSchema(
    label="AzureSQLServer",
    id=PropertyRef("server_id"),
    properties={"name": PropertyRef("name")},
    sub_resource_rel=RelSchema(
        target_label="AzureSubscription",
        rel_label="RESOURCE",
        direction=LinkDirection.INWARD,
        matcher=TargetNodeMatcher({"id": PropertyRef("subscription_id")}),
    ),
)

AZURE_SQL_DATABASE_SCHEMA = NodeSchema(
    label="AzureSQLDatabase",
    id=PropertyRef("db_id"),
    properties={"name": PropertyRef("name")},
    other_rels=(
        RelSchema(
            target_label="AzureSQLServer",
            rel_label="RESOURCE",
            direction=LinkDirection.INWARD,
            matcher=TargetNodeMatcher({"id": PropertyRef("server_id")}),
        ),
    ),
)


def sync_azure_storage_sql(
    store: GraphStore,
    storage_accounts: DataFrame,
    blob_containers: DataFrame,
    sql_servers: DataFrame,
    sql_databases: DataFrame,
    update_tag: int,
) -> None:
    """Storage account -> blob service -> container chain and SQL server ->
    database family (reference storage.py / sql.py sync order)."""
    if store.stage_done("azure:storage_sql", update_tag):
        return
    blob_services = blob_containers.select("blob_service_id", "account_id").distinct()
    node_frames = [
        compile_nodes(storage_accounts, AZURE_STORAGE_ACCOUNT_SCHEMA, update_tag),
        compile_nodes(blob_services, AZURE_BLOB_SERVICE_SCHEMA, update_tag),
        compile_nodes(blob_containers, AZURE_BLOB_CONTAINER_SCHEMA, update_tag),
        compile_nodes(sql_servers, AZURE_SQL_SERVER_SCHEMA, update_tag),
        compile_nodes(sql_databases, AZURE_SQL_DATABASE_SCHEMA, update_tag),
    ]
    nodes = node_frames[0]
    for f in node_frames[1:]:
        nodes = nodes.unionByName(f)
    live = store.nodes().unionByName(nodes)
    edge_frames = [
        compile_edges(storage_accounts, AZURE_STORAGE_ACCOUNT_SCHEMA, store.nodes(), update_tag),
        compile_edges(blob_services, AZURE_BLOB_SERVICE_SCHEMA, live, update_tag),
        compile_edges(blob_containers, AZURE_BLOB_CONTAINER_SCHEMA, live, update_tag),
        compile_edges(sql_servers, AZURE_SQL_SERVER_SCHEMA, store.nodes(), update_tag),
        compile_edges(sql_databases, AZURE_SQL_DATABASE_SCHEMA, live, update_tag),
    ]
    edges = edge_frames[0]
    for f in edge_frames[1:]:
        edges = edges.unionByName(f)
    store.upsert(nodes, edges, "azure:storage_sql", update_tag)
