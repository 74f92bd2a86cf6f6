"""Bulk graph build: the whole sync's nodes+edges as two DataFrames, one
snapshot commit.

``pipeline.run_sync`` mirrors the reference's stage-by-stage commits (each
stage checkpointed, resumable).  At 10^12-doc scale the per-stage pattern is
what Iceberg MERGE INTO makes cheap (only changed files rewritten); on the
sandbox's plain-parquet store each commit rewrites the tables, so the bulk
path exists for (a) benchmarks measuring compute rather than commit count
and (b) cold-start initial loads, where one commit is the right shape
anyway.  Scope: the bulk builder covers the core AWS IAM/EMR/S3 + Okta +
documents family set (the benchmark slice); the staged ``run_sync`` is the
full provider surface.  For the shared families both paths produce
identical triples (same compile_* programs; POLICY/permission edges reuse
the staged path's principal resolution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cartography_spark.core.loader import compile_edges, compile_nodes
from cartography_spark.core.model import NodeSchema, PropertyRef
from cartography_spark.modules.aws_base import ACCOUNT_SCHEMA, account_resource_rel
from cartography_spark.modules.aws_emr import EMR_CLUSTER_SCHEMA
from cartography_spark.modules.aws_iam import (
    GROUP_SCHEMA,
    MEMBERSHIP_SCHEMA,
    POLICY_SCHEMA,
    ROLE_SCHEMA,
    STATEMENT_SCHEMA,
    USER_SCHEMA,
    arn_account,
)
from cartography_spark.modules.okta import (
    GROUP_SCHEMA as OKTA_GROUP_SCHEMA,
    MEMBER_SCHEMA as OKTA_MEMBER_SCHEMA,
    ORG_SCHEMA as OKTA_ORG_SCHEMA,
    SAML_RE,
    USER_SCHEMA as OKTA_USER_SCHEMA,
)
from cartography_spark.sources import fixtures as fx

S3_SCHEMA = NodeSchema(
    label="S3Bucket",
    id=PropertyRef("arn"),
    properties={"name": PropertyRef("name"), "account_id": PropertyRef("account_id")},
    sub_resource_rel=account_resource_rel(),
)


def _edge(src_id: str, src_label: str, rel: str, dst_id: str, dst_label: str, tag: int):
    """Edge projection as selectExpr strings — one py4j call per edge family
    instead of eight Column round trips (driver plan-latency matters: the
    bulk builder assembles ~16 families per run)."""
    return [
        f"{src_id} AS src_id",
        f"'{src_label}' AS src_label",
        f"'{rel}' AS rel_label",
        f"{dst_id} AS dst_id",
        f"'{dst_label}' AS dst_label",
        "CAST(NULL AS MAP<STRING,STRING>) AS props",
        "CAST(NULL AS BIGINT) AS firstseen",
        f"CAST({int(tag)} AS BIGINT) AS lastupdated",
    ]


def build_graph(
    spark: SparkSession, sf_dir: str, update_tag: int, with_documents: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(nodes, edges) for the full sync, computed without a store."""
    accounts = fx.aws_accounts(spark, sf_dir)
    users = fx.iam_users(spark, sf_dir)
    groups = fx.iam_groups(spark, sf_dir)
    roles = fx.iam_roles(spark, sf_dir)
    memberships = fx.iam_group_memberships(spark, sf_dir)
    clusters = fx.emr_clusters(spark, sf_dir)
    buckets = fx.s3_buckets(spark, sf_dir)
    policies = fx.iam_policies(spark, sf_dir)
    statements = fx.iam_policy_statements(spark, sf_dir)
    tags = fx.resource_tags(spark, sf_dir)
    o_orgs, o_groups = fx.okta_orgs(spark, sf_dir), fx.okta_groups(spark, sf_dir)
    o_users, o_members = fx.okta_users(spark, sf_dir), fx.okta_group_members(spark, sf_dir)

    tag = update_tag
    # compiled once, reused by both the node union and the edge-phase target
    # lookups below — each compile_nodes costs ~20 ms of driver py4j latency.
    # dedupe=False throughout: every bulk family id is an injective formula
    # over a distinct source key (custkey/suppkey/nationkey/regionkey PKs, or
    # an explicit .distinct() for groups/buckets), so the MERGE-collapse
    # window is a no-op — skipping it removes one exchange+sort per family
    # (11 total) from the node-union materialization (same contract as
    # fixture_nodes in kg/materialize.py; uniqueness asserted per family by
    # tests/test_bulk.py::test_bulk_family_ids_unique)
    acct_node_df = compile_nodes(accounts, ACCOUNT_SCHEMA, tag, {"inscope": "true"}, dedupe=False)
    group_node_df = compile_nodes(groups, GROUP_SCHEMA, tag, dedupe=False)
    okta_org_node_df = compile_nodes(o_orgs, OKTA_ORG_SCHEMA, tag, dedupe=False)
    okta_group_node_df = compile_nodes(o_groups, OKTA_GROUP_SCHEMA, tag, dedupe=False)
    node_parts = [
        acct_node_df,
        compile_nodes(users, USER_SCHEMA, tag, dedupe=False),
        group_node_df,
        compile_nodes(roles.drop("trust_principals"), ROLE_SCHEMA, tag, dedupe=False),
        compile_nodes(clusters, EMR_CLUSTER_SCHEMA, tag, dedupe=False),
        compile_nodes(buckets, S3_SCHEMA, tag, dedupe=False),
        compile_nodes(
            policies.withColumnRenamed("policy_id", "pid"),
            NodeSchema(
                label="AWSPolicy",
                id=PropertyRef("pid"),
                properties={"name": PropertyRef("name"), "principal_arn": PropertyRef("principal_arn")},
            ),
            tag,
            dedupe=False,
        ),
        compile_nodes(
            statements,
            NodeSchema(
                label="AWSPolicyStatement",
                id=PropertyRef("statement_id"),
                properties={
                    "effect": PropertyRef("effect"),
                    "action": PropertyRef("action"),
                    "resource": PropertyRef("resource"),
                },
            ),
            tag,
            dedupe=False,
        ),
        okta_org_node_df,
        okta_group_node_df,
        compile_nodes(o_users, OKTA_USER_SCHEMA, tag, dedupe=False),
    ]

    # trust principals + synthesized foreign accounts
    trusts = roles.select(
        F.col("arn").alias("role_arn"), F.explode("trust_principals").alias("p")
    ).select("role_arn", F.col("p.type").alias("ptype"), F.col("p.value").alias("principal"))
    spn_nodes = trusts.select(
        F.col("principal").alias("id"),
        F.lit("AWSPrincipal").alias("label"),
        F.map_from_arrays(F.array(F.lit("type")), F.array(F.col("ptype"))).alias("props"),
        F.lit(None).cast("array<string>").alias("extra_labels"),
        F.lit(None).cast("long").alias("firstseen"),
        F.lit(tag).alias("lastupdated"),
    ).dropDuplicates(["id"])
    foreign = trusts.withColumn("acct", arn_account(F.col("principal"))).where(F.col("acct") != "")
    known = accounts.select("id")
    acct_nodes = (
        foreign.select(F.col("acct").alias("id"))
        .distinct()
        .join(known, ["id"], "left_anti")
        .select(
            "id",
            F.lit("AWSAccount").alias("label"),
            F.lit(None).cast("map<string,string>").alias("props"),
            F.lit(None).cast("array<string>").alias("extra_labels"),
            F.lit(None).cast("long").alias("firstseen"),
            F.lit(tag).alias("lastupdated"),
        )
    )
    # tag nodes
    tag_ex = tags.select("ResourceARN", F.explode("Tags").alias("t")).select(
        "ResourceARN",
        F.concat(F.col("t.Key"), F.lit(":"), F.col("t.Value")).alias("tag_id"),
        F.col("t.Key").alias("key"),
        F.col("t.Value").alias("value"),
    )
    tag_nodes = tag_ex.select(
        F.col("tag_id").alias("id"),
        F.lit("AWSTag").alias("label"),
        F.map_from_arrays(
            F.array(F.lit("key"), F.lit("value")), F.array("key", "value")
        ).alias("props"),
        F.lit(None).cast("array<string>").alias("extra_labels"),
        F.lit(None).cast("long").alias("firstseen"),
        F.lit(tag).alias("lastupdated"),
    ).dropDuplicates(["id"])

    nodes = node_parts[0]
    for p in node_parts[1:] + [spn_nodes, acct_nodes, tag_nodes]:
        nodes = nodes.unionByName(p)
    # No consolidating repartition (r6): with dedupe=False the family
    # branches are scan-split-sized narrow projections (1-2 partitions each,
    # not a 32-partition window exchange per family), so the narrow union
    # stays at a few dozen partitions — the full-node-set shuffle that used
    # to consolidate it cost more than the task-count it saved (measured at
    # sf0.1: graph_commit 7.6 -> 5.5 s).  The three synthesized branches
    # (spn/acct/tag) end in AQE-coalesced exchanges, and every consumer of
    # the checkpoint re-keys for itself (the store write repartitions on
    # (label, id); dictionary/canonicalization aggregate on their own keys).

    # ---- edges --------------------------------------------------------------
    edge_parts = [
        compile_edges(users, USER_SCHEMA, acct_node_df, tag),
        compile_edges(groups, GROUP_SCHEMA, acct_node_df, tag),
        compile_edges(roles.drop("trust_principals"), ROLE_SCHEMA, acct_node_df, tag),
        compile_edges(clusters, EMR_CLUSTER_SCHEMA, acct_node_df, tag),
        compile_edges(buckets, S3_SCHEMA, acct_node_df, tag),
        compile_edges(memberships, MEMBERSHIP_SCHEMA, group_node_df, tag),
        compile_edges(o_groups, OKTA_GROUP_SCHEMA, okta_org_node_df, tag),
        compile_edges(o_users, OKTA_USER_SCHEMA, okta_org_node_df, tag),
        compile_edges(o_members, OKTA_MEMBER_SCHEMA, okta_group_node_df, tag),
        trusts.selectExpr(
            *_edge("role_arn", "AWSRole", "TRUSTS_AWS_PRINCIPAL", "principal", "AWSPrincipal", tag)
        ),
        foreign.selectExpr(
            *_edge("acct", "AWSAccount", "RESOURCE", "principal", "AWSPrincipal", tag)
        ),
        # POLICY edges resolve src_label from the matched principal (parity
        # with sync_policies' principal join) — a policy attached to a user
        # or group binds to that node, and unmatched principal_arns prune out.
        policies.join(
            F.broadcast(
                users.select(F.col("arn").alias("p_id"), F.lit("AWSUser").alias("p_label"))
                .unionByName(
                    groups.select(F.col("arn").alias("p_id"), F.lit("AWSGroup").alias("p_label"))
                )
                .unionByName(
                    roles.select(F.col("arn").alias("p_id"), F.lit("AWSRole").alias("p_label"))
                )
            ),
            policies["principal_arn"] == F.col("p_id"),
            "inner",
        ).select(
            F.col("p_id").alias("src_id"),
            F.col("p_label").alias("src_label"),
            F.lit("POLICY").alias("rel_label"),
            F.col("policy_id").alias("dst_id"),
            F.lit("AWSPolicy").alias("dst_label"),
            F.lit(None).cast("map<string,string>").alias("props"),
            F.lit(None).cast("long").alias("firstseen"),
            F.lit(tag).alias("lastupdated"),
        ),
        statements.selectExpr(
            *_edge("policy_id", "AWSPolicy", "STATEMENT", "statement_id", "AWSPolicyStatement", tag)
        ),
    ]

    # TAGGED (resources are clusters by construction)
    edge_parts.append(
        tag_ex.join(
            clusters.select(F.col("ClusterArn").alias("ResourceARN")), "ResourceARN", "inner"
        ).selectExpr(
            *_edge("ResourceARN", "EMRCluster", "TAGGED", "tag_id", "AWSTag", tag)
        )
    )

    # SAML ALLOWED_BY + CAN_ASSUME_ROLE
    mapped = o_groups.select(
        F.col("id").alias("group_id"),
        F.concat(
            F.lit("arn:aws:iam::"), F.regexp_extract("name", SAML_RE, 2),
            F.lit(":role/"), F.regexp_extract("name", SAML_RE, 1),
        ).alias("role_arn"),
    ).where(F.regexp_extract("name", SAML_RE, 2) != "")
    role_ids = roles.select(F.col("arn").alias("role_arn"))
    allowed = mapped.join(F.broadcast(role_ids), "role_arn", "inner")
    edge_parts.append(
        allowed.selectExpr(
            *_edge("role_arn", "AWSRole", "ALLOWED_BY", "group_id", "OktaGroup", tag)
        )
    )
    edge_parts.append(
        o_members.join(F.broadcast(allowed), "group_id", "inner").selectExpr(
            *_edge("user_id", "OktaUser", "CAN_ASSUME_ROLE", "role_arn", "AWSRole", tag)
        )
    )

    # permission theta-joins
    from cartography_spark.modules.permissions import evaluate_permissions, sts_assumerole_pairs

    can_read = evaluate_permissions(policies, statements, buckets, "s3:GetObject")
    edge_parts.append(
        can_read.selectExpr(
            *_edge("principal_arn", "AWSPrincipal", "CAN_READ", "resource_arn", "S3Bucket", tag)
        )
    )
    sts = sts_assumerole_pairs(
        trusts.select("role_arn", F.col("principal").alias("trusted")),
        roles.select(F.col("arn").alias("principal_arn"), F.col("account_id").alias("acct")),
        policies,
        statements,
    )
    edge_parts.append(
        sts.selectExpr(
            *_edge("principal_arn", "AWSPrincipal", "STS_ASSUMEROLE_ALLOW", "role_arn", "AWSRole", tag)
        )
    )

    edges = edge_parts[0]
    for p in edge_parts[1:]:
        edges = edges.unionByName(p)
    # no consolidating repartition here (r6): the terminal
    # dropDuplicates(src, rel, dst) below performs its own exchange on its
    # key — an earlier repartition on (rel_label, src_id) was a second full
    # shuffle of the edge set that the dedup exchange immediately re-keyed

    if with_documents:
        from cartography_spark.kg.materialize import document_nodes, mention_edges
        from cartography_spark.sources.docs_synth import interleaved_documents

        docs = interleaved_documents(spark, sf_dir)
        # mention_edges walks the node frame many times (dictionary,
        # canonicalization, label join) — materialize the union once.
        # localCheckpoint instead of cache(): same reuse, but the blocks are
        # freed by the ContextCleaner when the frame is GC'd (the r5 audit
        # flagged the unpersist-less cache as a long-lived-driver leak), and
        # every consumer re-analyzes a leaf RDD scan instead of the 13-branch
        # union plan (driver plan latency)
        nodes = nodes.unionByName(document_nodes(docs, tag)).localCheckpoint()
        # assume_forest: provable from fixture construction (disjoint
        # AWSUser/OktaUser id namespaces, one identity key per node) — skips
        # the runtime bridge-check job (canonical_mapping's contract)
        edges = edges.unionByName(mention_edges(docs, nodes, tag, assume_forest=True))

    return nodes, edges.dropDuplicates(["src_id", "rel_label", "dst_id"])
