"""Guards for the bulk builder's dedupe=False contract (r6).

build_graph compiles its node families with ``dedupe=False`` — valid only
while every family id stays an injective formula over a distinct source key.
If a fixture change ever breaks that, these tests fail before the store's
MERGE semantics silently change.
"""

from tests.conftest import SF_DIR


def _families(spark):
    from cartography_spark.sources import fixtures as fx

    return [
        ("aws_accounts", fx.aws_accounts(spark, SF_DIR), "id"),
        ("iam_users", fx.iam_users(spark, SF_DIR), "arn"),
        ("iam_groups", fx.iam_groups(spark, SF_DIR), "arn"),
        ("iam_roles", fx.iam_roles(spark, SF_DIR), "arn"),
        ("emr_clusters", fx.emr_clusters(spark, SF_DIR), "ClusterArn"),
        ("s3_buckets", fx.s3_buckets(spark, SF_DIR), "arn"),
        ("iam_policies", fx.iam_policies(spark, SF_DIR), "policy_id"),
        ("iam_policy_statements", fx.iam_policy_statements(spark, SF_DIR), "statement_id"),
        ("okta_orgs", fx.okta_orgs(spark, SF_DIR), "id"),
        ("okta_groups", fx.okta_groups(spark, SF_DIR), "id"),
        ("okta_users", fx.okta_users(spark, SF_DIR), "id"),
    ]


def test_bulk_family_ids_unique(spark):
    bad = []
    for name, df, idc in _families(spark):
        n = df.count()
        d = df.select(idc).distinct().count()
        if n != d:
            bad.append((name, n, d))
    assert not bad, f"bulk families with duplicate ids (dedupe=False unsafe): {bad}"


def test_build_graph_nodes_have_unique_keys(spark):
    from cartography_spark.kg.bulk import build_graph

    nodes, _ = build_graph(spark, SF_DIR, 123456789)
    total = nodes.count()
    distinct = nodes.select("label", "id").distinct().count()
    assert total == distinct
