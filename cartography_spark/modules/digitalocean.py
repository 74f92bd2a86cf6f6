"""DigitalOcean module: accounts, projects, droplets.

Parity map (reference cartography/intel/digitalocean/):
  * platform.py:50-60   — DOAccount{id}
  * management.py:78-96 — DOProject{id}, (DOAccount)-[:RESOURCE]->(DOProject)
  * compute.py:85-112   — DODroplet{id}, (DOProject)-[:RESOURCE]->(DODroplet)

Third distinct tenancy grammar after AWSAccount and GCPProject — the
account->project->droplet RESOURCE chain proves the sub_resource compiler is
provider-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cartography_spark.core.loader import compile_edges, compile_nodes, live_view
from cartography_spark.core.model import (
    LinkDirection,
    NodeSchema,
    PropertyRef,
    RelSchema,
    TargetNodeMatcher,
)
from cartography_spark.core.store import GraphStore

DO_ACCOUNT_SCHEMA = NodeSchema(label="DOAccount", id=PropertyRef("id"))

DO_PROJECT_SCHEMA = NodeSchema(
    label="DOProject",
    id=PropertyRef("id"),
    properties={"name": PropertyRef("name")},
    sub_resource_rel=RelSchema(
        target_label="DOAccount",
        rel_label="RESOURCE",
        direction=LinkDirection.INWARD,
        matcher=TargetNodeMatcher({"id": PropertyRef("account_id")}),
    ),
)

DO_DROPLET_SCHEMA = NodeSchema(
    label="DODroplet",
    id=PropertyRef("id"),
    properties={"name": PropertyRef("name"), "region": PropertyRef("region")},
    sub_resource_rel=RelSchema(
        target_label="DOProject",
        rel_label="RESOURCE",
        direction=LinkDirection.INWARD,
        matcher=TargetNodeMatcher({"id": PropertyRef("project_id")}),
    ),
)


def sync_digitalocean(
    store: GraphStore,
    accounts: DataFrame,
    projects: DataFrame,
    droplets: DataFrame,
    update_tag: int,
) -> None:
    if store.stage_done("digitalocean", update_tag):
        return
    nodes = (
        compile_nodes(accounts, DO_ACCOUNT_SCHEMA, update_tag)
        .unionByName(compile_nodes(projects, DO_PROJECT_SCHEMA, update_tag))
        .unionByName(compile_nodes(droplets, DO_DROPLET_SCHEMA, update_tag))
    )
    live = live_view(store, nodes)
    edges = compile_edges(projects, DO_PROJECT_SCHEMA, live, update_tag).unionByName(
        compile_edges(droplets, DO_DROPLET_SCHEMA, live, update_tag)
    )
    store.upsert(nodes, edges, "digitalocean", update_tag)
