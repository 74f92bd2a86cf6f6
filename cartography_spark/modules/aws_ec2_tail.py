"""EC2 long-tail families: AMIs, internet gateways, reserved instances,
transit gateways (+attachments), VPC peerings, launch templates (+versions).

Parity map (reference cartography/intel/aws/ec2/):
  * EC2Image                    — images.py (EC2Image{id: ImageId}, RESOURCE)
  * AWSInternetGateway          — internet_gateways.py:32-50
                                  ((ig)-[:ATTACHED_TO]->(AWSVpc))
  * EC2ReservedInstance         — reserved_instances.py:36-45
  * AWSTransitGateway           — tgw.py:76-90
  * AWSTransitGatewayAttachment — tgw.py:146-214
                                  ((tgwa)-[:ATTACHED_TO]->(tgw); the VPC
                                  RESOURCE leg is tgw.py:196-202)
  * AWSPeeringConnection        — vpc_peerings.py:31-73
                                  (ACCEPTER_VPC / REQUESTER_VPC)
  * LaunchTemplate(+Version)    — models/aws/ec2/launch_templates.py,
                                  launch_template_versions.py (VERSION rel)

All eight schemas compile from ONE wide fixture frame
(fixtures.ec2_tail_inventory) filtered by ``kind`` — null-gated edge
columns drop at the inner equi-join exactly as in the other modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cartography_spark.core.loader import compile_edges, compile_nodes, live_view
from cartography_spark.core.model import (
    LinkDirection,
    NodeSchema,
    PropertyRef,
    RelSchema,
    TargetNodeMatcher,
)
from cartography_spark.core.store import GraphStore
from cartography_spark.modules.aws_base import account_resource_rel


def _simple(label: str, **rels) -> NodeSchema:
    return NodeSchema(
        label=label,
        id=PropertyRef("node_id"),
        properties={"name": PropertyRef("name"), "account_id": PropertyRef("account_id")},
        sub_resource_rel=account_resource_rel(),
        other_rels=tuple(
            RelSchema(
                target_label=tl,
                rel_label=rl,
                direction=LinkDirection.OUTWARD,
                matcher=TargetNodeMatcher({"id": PropertyRef(src)}),
            )
            for src, (rl, tl) in rels.items()
        ),
    )


IMAGE_SCHEMA = _simple("EC2Image")
IGW_SCHEMA = _simple("AWSInternetGateway", vpc_id=("ATTACHED_TO", "AWSVpc"))
RESERVED_SCHEMA = _simple("EC2ReservedInstance")
TGW_SCHEMA = _simple("AWSTransitGateway")
TGWA_SCHEMA = _simple(
    "AWSTransitGatewayAttachment",
    tgw_id=("ATTACHED_TO", "AWSTransitGateway"),
)
PCX_SCHEMA = _simple(
    "AWSPeeringConnection",
    requester_vpc=("REQUESTER_VPC", "AWSVpc"),
    accepter_vpc=("ACCEPTER_VPC", "AWSVpc"),
)
LT_SCHEMA = _simple("LaunchTemplate")
LTV_SCHEMA = _simple(
    "LaunchTemplateVersion", template_id=("VERSION", "LaunchTemplate")
)

_KIND_SCHEMAS = {
    "image": IMAGE_SCHEMA,
    "igw": IGW_SCHEMA,
    "reserved": RESERVED_SCHEMA,
    "tgw": TGW_SCHEMA,
    "tgwa": TGWA_SCHEMA,
    "pcx": PCX_SCHEMA,
    "lt": LT_SCHEMA,
    "ltv": LTV_SCHEMA,
}


def sync_ec2_tail(store: GraphStore, inventory: DataFrame, update_tag: int) -> None:
    """One grouped upsert for all eight families: nodes compile per kind
    slice; edges compile against the live nodes UNION the batch (tgwa→tgw
    and ltv→lt attach within the batch)."""
    if store.stage_done("aws:ec2:tail", update_tag):
        return
    nodes = None
    for kind, schema in _KIND_SCHEMAS.items():
        part = compile_nodes(
            inventory.where(F.col("kind") == kind), schema, update_tag, dedupe=False
        )
        nodes = part if nodes is None else nodes.unionByName(part)
    live = live_view(store, nodes)
    edges = None
    for kind, schema in _KIND_SCHEMAS.items():
        part = compile_edges(
            inventory.where(F.col("kind") == kind), schema, live, update_tag
        )
        edges = part if edges is None else edges.unionByName(part)
    store.upsert(nodes, edges, "aws:ec2:tail", update_tag)
