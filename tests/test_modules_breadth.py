"""Round-2 breadth: EC2/GCP/S3-ACL modules, analysis-job registry,
selected_relationships, RPR config, principal stub matching, per-key props
merge — golden-output tests mirroring the reference's integration suites
(tests/integration/cartography/intel/...)."""

import pyspark.sql.functions as F
import pytest

from cartography_spark.core.loader import compile_edges, compile_nodes
from cartography_spark.modules.aws_base import sync_accounts
from cartography_spark.sources import fixtures as fx
from tests.util import check_rels

SF = "/root/testdata/sf0.001"
T1, T2 = 111111111, 222222222


def test_ec2_module_graph_shape(spark, store):
    """EC2Instance/SG/rule/range families + membership edges
    (reference tests/integration/.../test_ec2_instances.py,
    test_ec2_security_groups.py)."""
    from cartography_spark.modules.aws_ec2 import sync_ec2

    sync_accounts(store, fx.aws_accounts(spark, SF), T1)
    sync_ec2(
        store,
        fx.ec2_instances(spark, SF),
        fx.ec2_security_groups(spark, SF),
        fx.ec2_sg_rules(spark, SF),
        T1,
    )
    labels = {r[0] for r in store.nodes().select("label").distinct().collect()}
    assert {"EC2Instance", "EC2SecurityGroup", "IpPermissionInbound", "IpRange"} <= labels
    members = check_rels(store, "EC2Instance", "MEMBER_OF_EC2_SECURITY_GROUP", "EC2SecurityGroup")
    assert len(members) > 0
    # every member edge's sg must exist as a node
    sg_ids = {r[0] for r in store.nodes().where(F.col("label") == "EC2SecurityGroup").select("id").collect()}
    assert {m[1] for m in members} <= sg_ids
    ranges = check_rels(store, "IpRange", "MEMBER_OF_IP_RULE", "IpPermissionInbound")
    assert {r[0] for r in ranges} == {"0.0.0.0/0", "10.0.0.0/8"}


def test_gcp_module_resource_edges(spark, store):
    """Non-AWS sub-resource: (GCPProject)-[:RESOURCE]->(GCPInstance)."""
    from cartography_spark.modules.gcp import sync_gcp

    sync_gcp(store, fx.gcp_projects(spark, SF), fx.gcp_instances(spark, SF), T1)
    rels = check_rels(store, "GCPProject", "RESOURCE", "GCPInstance")
    assert len(rels) > 0
    for proj, inst in rels:
        assert inst.startswith(proj + "/zones/")


def test_analysis_jobs_store_roundtrip(spark, store):
    """All five registry jobs run store->store and leave the expected marks
    (reference data/jobs/analysis/*.json)."""
    from cartography_spark.analysis.registry import run_analysis_jobs
    from cartography_spark.modules.aws_ec2 import sync_ec2
    from cartography_spark.modules.aws_iam import sync_principals, sync_role_trusts
    from cartography_spark.modules.aws_s3 import sync_s3
    from cartography_spark.modules.hr import sync_humans
    from cartography_spark.modules.okta import sync_okta

    sync_accounts(store, fx.aws_accounts(spark, SF), T1)
    sync_principals(
        store, fx.iam_users(spark, SF), fx.iam_groups(spark, SF), fx.iam_roles(spark, SF), T1
    )
    sync_role_trusts(store, fx.iam_roles(spark, SF), T1)
    sync_s3(store, fx.s3_buckets(spark, SF), fx.s3_acls(spark, SF), T1)
    sync_ec2(
        store,
        fx.ec2_instances(spark, SF),
        fx.ec2_security_groups(spark, SF),
        fx.ec2_sg_rules(spark, SF),
        T1,
    )
    sync_okta(
        store,
        fx.okta_orgs(spark, SF), fx.okta_groups(spark, SF),
        fx.okta_users(spark, SF), fx.okta_group_members(spark, SF),
        T1,
    )
    sync_humans(store, fx.humans(spark, SF), T1)

    ran = run_analysis_jobs(store, spark, SF, T1)
    # full registry runs (one entry per reference analysis JSON); jobs whose
    # labels weren't synced here are set-wise no-ops on empty slices
    assert set(ran) == {
        "aws_asset_exposure", "aws_eks_exposure", "aws_foreign_accounts",
        "aws_s3acl", "aws_ec2_iaminstanceprofile", "aws_ec2_keypair",
        "aws_lambda_ecr", "gcp_inet_exposure", "gcp_gke_exposure",
        "gcp_gke_basic_auth", "human_link",
    }
    nodes, edges = store.nodes(), store.edges()
    # foreign accounts marked, inscope ones not
    foreign = nodes.where(F.element_at("props", "foreign") == "true")
    assert foreign.count() > 0
    assert foreign.where(F.element_at("props", "inscope").isNotNull()).count() == 0
    # anonymous buckets marked with a JSON action list
    anon = nodes.where(F.element_at("props", "anonymous_access") == "true")
    assert anon.count() > 0
    assert anon.where(~F.element_at("props", "anonymous_actions").startswith("[")).count() == 0
    # instance-profile STS edges bind instances to same-account roles
    sts = edges.where(
        (F.col("rel_label") == "STS_ASSUMEROLE_ALLOW") & (F.col("src_label") == "EC2Instance")
    )
    assert sts.count() > 0
    # human identity links
    assert edges.where(F.col("rel_label") == "IDENTITY_OKTA").count() > 0
    # idempotent: re-run under the same tag is a no-op (stage checkpoints)
    assert run_analysis_jobs(store, spark, SF, T1) == []


def test_trust_binds_to_existing_principal_not_stub(spark, store):
    """ADVICE: a role trusting a real AWSUser ARN must bind the trust edge to
    the existing node (shared AWSPrincipal extra label), not create a
    duplicate stub (reference MERGE (:AWSPrincipal{arn}) matching)."""
    from cartography_spark.modules.aws_iam import USER_SCHEMA, sync_role_trusts

    users = spark.createDataFrame(
        [("arn:aws:iam::000000000000:user/u1", "u1", "u1@x.example.com", "AIDA1", "/", "000000000000")],
        ["arn", "name", "email", "userid", "path", "account_id"],
    )
    store.upsert(compile_nodes(users, USER_SCHEMA, T1), None, "users", T1)

    roles = spark.createDataFrame(
        [(
            "arn:aws:iam::000000000000:role/r1", "r1", "000000000000",
            [{"type": "AWS", "value": "arn:aws:iam::000000000000:user/u1"}],
        )],
        "arn string, name string, account_id string, trust_principals array<struct<type:string,value:string>>",
    )
    sync_role_trusts(store, roles, T1)

    # no duplicate stub under label AWSPrincipal for the user's ARN
    dupes = store.nodes().where(
        (F.col("id") == "arn:aws:iam::000000000000:user/u1")
        & (F.col("label") == "AWSPrincipal")
    )
    assert dupes.count() == 0
    # trust edge points at the real node's label
    e = store.edges().where(F.col("rel_label") == "TRUSTS_AWS_PRINCIPAL").collect()
    assert len(e) == 1 and e[0].dst_label == "AWSUser"


def test_selected_relationships_subset_and_validation(spark):
    """Partial-rel loading (reference querybuilder.py:307-346 +
    tests/unit/.../test_querybuilder_filter_selected_rels.py)."""
    from cartography_spark.modules.aws_ec2 import EC2_INSTANCE_SCHEMA, EC2_SG_SCHEMA

    sgs = compile_nodes(fx.ec2_security_groups(spark, SF), EC2_SG_SCHEMA, T1)
    inst = fx.ec2_instances(spark, SF)
    only_members = compile_edges(
        inst, EC2_INSTANCE_SCHEMA, sgs, T1,
        selected_relationships=["MEMBER_OF_EC2_SECURITY_GROUP"],
    )
    rels = {r[0] for r in only_members.select("rel_label").distinct().collect()}
    assert rels == {"MEMBER_OF_EC2_SECURITY_GROUP"}
    with pytest.raises(ValueError, match="not declared"):
        compile_edges(inst, EC2_INSTANCE_SCHEMA, sgs, T1, selected_relationships=["NOPE"])


def test_rpr_mapping_file(spark):
    """Config-driven permission mappings (reference
    permission_relationships.py:284-305)."""
    from cartography_spark.modules.permissions import load_permission_mappings

    mappings = load_permission_mappings()
    assert {m["relationship_name"] for m in mappings} == {"CAN_READ", "CAN_LIST"}
    for m in mappings:
        assert m["permissions"] and m["target_label"] == "S3Bucket"


def test_upsert_props_merge_per_key(spark, store):
    """ADVICE: MERGE SET writes only declared props — a second writer's batch
    must not erase the first writer's keys."""
    from cartography_spark.core.loader import NODES_SCHEMA

    def node(props):
        return spark.createDataFrame(
            [("n1", "Thing", props, None, None, T1)], NODES_SCHEMA
        )

    store.upsert(node({"a": "1", "b": "2"}), None, "w1", T1)
    store.upsert(node({"b": "9", "c": "3"}), None, "w2", T1)
    row = store.nodes().where(F.col("id") == "n1").collect()[0]
    assert row.props == {"a": "1", "b": "9", "c": "3"}


def test_azure_module_resource_edges(spark, store):
    """Second non-AWS sub-resource (Azure resource-URI ids)."""
    from cartography_spark.modules.azure import sync_azure

    sync_azure(store, fx.azure_subscriptions(spark, SF), fx.azure_vms(spark, SF), T1)
    rels = check_rels(store, "AzureSubscription", "RESOURCE", "AzureVirtualMachine")
    assert len(rels) > 0
    for sub, vm in rels:
        assert vm.startswith(f"/subscriptions/{sub}/")
