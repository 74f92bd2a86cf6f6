"""AWS Config + Security Hub modules.

Parity map:
  * SecurityHub{id: HubArn}           — reference intel/aws/securityhub.py:43-49
  * AWSConfigurationRecorder{id}      — reference intel/aws/config.py:58-67
  * AWSConfigRule{id: ConfigRuleArn}  — reference intel/aws/config.py:136-154

All three are flat account-scoped inventories (account RESOURCE edge only);
the value here is label coverage for the reference's remaining aws modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cartography_spark.core.loader import compile_edges, compile_nodes
from cartography_spark.core.model import NodeSchema, PropertyRef
from cartography_spark.core.store import GraphStore
from cartography_spark.modules.aws_base import account_resource_rel

SECURITYHUB_SCHEMA = NodeSchema(
    label="SecurityHub",
    id=PropertyRef("hub_arn"),
    properties={
        "subscribed_at": PropertyRef("subscribed_at"),
        "auto_enable_controls": PropertyRef("auto_enable_controls"),
        "account_id": PropertyRef("account_id"),
    },
    sub_resource_rel=account_resource_rel(),
)

CONFIG_RECORDER_SCHEMA = NodeSchema(
    label="AWSConfigurationRecorder",
    id=PropertyRef("config_id"),
    properties={"name": PropertyRef("name"), "account_id": PropertyRef("account_id")},
    sub_resource_rel=account_resource_rel(),
)

CONFIG_RULE_SCHEMA = NodeSchema(
    label="AWSConfigRule",
    id=PropertyRef("config_id"),
    properties={"name": PropertyRef("name"), "account_id": PropertyRef("account_id")},
    sub_resource_rel=account_resource_rel(),
)


def sync_config_securityhub(
    store: GraphStore,
    hubs: DataFrame,
    config_rows: DataFrame,
    update_tag: int,
) -> None:
    if not store.stage_done("aws:securityhub", update_tag):
        store.upsert(
            compile_nodes(hubs, SECURITYHUB_SCHEMA, update_tag),
            compile_edges(hubs, SECURITYHUB_SCHEMA, store.nodes, update_tag),
            "aws:securityhub",
            update_tag,
        )
    if not store.stage_done("aws:config", update_tag):
        recorders = config_rows.where(F.col("kind") == "recorder")
        rules = config_rows.where(F.col("kind") == "rule")
        nodes = compile_nodes(recorders, CONFIG_RECORDER_SCHEMA, update_tag).unionByName(
            compile_nodes(rules, CONFIG_RULE_SCHEMA, update_tag)
        )
        edges = compile_edges(
            recorders, CONFIG_RECORDER_SCHEMA, store.nodes, update_tag
        ).unionByName(compile_edges(rules, CONFIG_RULE_SCHEMA, store.nodes, update_tag))
        store.upsert(nodes, edges, "aws:config", update_tag)
