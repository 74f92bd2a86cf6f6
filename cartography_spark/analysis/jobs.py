"""Analysis jobs beyond asset exposure — the registry's job library.

Each function is the set-wise DataFrame restatement of one reference
analysis JSON (data/jobs/analysis/); all run store->store at sync end, and
every prop-setting job rewrites ONLY the label slice it touches
(commit_partial) with idempotent clearing of stale marks, mirroring the
reference jobs' clearing statements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cartography_spark.core.store import GraphStore

GLOBAL_ACL_URIS = (
    "http://acs.amazonaws.com/groups/global/AllUsers",
    "http://acs.amazonaws.com/groups/global/AuthenticatedUsers",
)

# permission -> granted anonymous actions (reference aws_s3acl_analysis.json
# comments map ACL grants to the S3 actions they imply)
ACL_ACTIONS = {
    "READ": ["s3:ListBucket", "s3:ListBucketVersions", "s3:ListBucketMultipartUploads"],
    "WRITE": ["s3:PutObject"],
    "READ_ACP": ["s3:GetBucketAcl"],
    "WRITE_ACP": ["s3:PutBucketAcl"],
    "FULL_CONTROL": [
        "s3:ListBucket", "s3:ListBucketVersions", "s3:ListBucketMultipartUploads",
        "s3:PutObject", "s3:DeleteObject", "s3:DeleteObjectVersion", "s3:PutBucketAcl",
    ],
}


def _strip_keys(props, *keys):
    """props map minus the given keys (NULL-safe; empty result stays a map
    only if nonempty, matching the engine's props-null convention)."""
    out = _strip_keys_keepempty(props, *keys)
    return F.when(F.size(out) > 0, out).otherwise(F.lit(None))


def _strip_keys_keepempty(props, *keys):
    """Like _strip_keys but never NULL — the safe left arg for map_concat
    (map_concat(NULL, m) is NULL, which would silently drop the mark)."""
    return F.map_filter(
        F.coalesce(props, F.create_map().cast("map<string,string>")),
        lambda k, _: ~k.isin(*keys),
    )


def mark_foreign_accounts(
    store: GraphStore, spark: SparkSession, sf_dir: str, update_tag: int
) -> None:
    """aws_foreign_accounts.json: accounts without ``inscope`` get
    ``foreign=true``; inscope accounts lose any stale ``foreign`` mark.
    One AWSAccount-slice rewrite (both reference statements in one pass)."""
    accts = store.nodes(labels=["AWSAccount"])
    inscope = F.element_at("props", "inscope").isNotNull()
    marked = F.map_concat(
        _strip_keys_keepempty(F.col("props"), "foreign"),
        F.create_map(F.lit("foreign"), F.lit("true")),
    )
    out = accts.withColumn(
        "props", F.when(inscope, _strip_keys(F.col("props"), "foreign")).otherwise(marked)
    )
    store.commit_partial(
        out, None, ["AWSAccount"], [], "analysis:aws_foreign_accounts", update_tag
    )


def mark_s3_anonymous(
    store: GraphStore, spark: SparkSession, sf_dir: str, update_tag: int
) -> None:
    """aws_s3acl_analysis.json: buckets with a global-group ACL grant get
    anonymous_access=true + the granted action list; others lose stale marks.

    The reference appends actions per matching grant; grants per bucket
    aggregate here as sorted-distinct so the list is order-deterministic
    under distributed evaluation.
    """
    acls = store.nodes(labels=["S3Acl"])
    applies = store.edges(rel_labels=["APPLIES_TO"]).select(
        F.col("src_id").alias("acl_id"), F.col("dst_id").alias("bucket_arn")
    )
    action_map = F.create_map(
        *[c for perm, acts in ACL_ACTIONS.items() for c in (F.lit(perm), F.lit(acts))]
    )
    global_grants = (
        acls.where(F.element_at("props", "uri").isin(*GLOBAL_ACL_URIS))
        .select(
            F.col("id").alias("acl_id"),
            F.element_at(action_map, F.element_at("props", "permission")).alias("actions"),
        )
        .where(F.col("actions").isNotNull())
        .join(applies, "acl_id")
        .groupBy("bucket_arn")
        .agg(
            F.to_json(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("actions"))))
            ).alias("anon_actions")
        )
    )
    buckets = store.nodes(labels=["S3Bucket"])
    joined = buckets.join(
        F.broadcast(global_grants),
        buckets["id"] == global_grants["bucket_arn"],
        "left",
    )
    out = joined.withColumn(
        "props",
        F.when(
            F.col("anon_actions").isNotNull(),
            F.map_concat(
                _strip_keys_keepempty(F.col("props"), "anonymous_access", "anonymous_actions"),
                F.create_map(
                    F.lit("anonymous_access"), F.lit("true"),
                    F.lit("anonymous_actions"), F.col("anon_actions"),
                ),
            ),
        ).otherwise(_strip_keys(F.col("props"), "anonymous_access", "anonymous_actions")),
    ).drop("bucket_arn", "anon_actions")
    store.commit_partial(
        out, None, ["S3Bucket"], [], "analysis:aws_s3acl", update_tag
    )


def _cleanup_rel(store: GraphStore, rel_label: str, update_tag: int, stage: str) -> None:
    """Drop stale edges of one rel (the iterative DELETE leg every
    edge-writing reference analysis job carries, e.g. gsuite_human_link.json
    statement 2)."""
    stale = (
        store.edges(rel_labels=[rel_label])
        .where(F.col("lastupdated") != int(update_tag))
        .select("src_id", "rel_label", "dst_id")
    )
    store.delete(None, stale, stage, update_tag)


def ec2_iam_instanceprofiles(
    store: GraphStore, spark: SparkSession, sf_dir: str, update_tag: int
) -> None:
    """aws_ec2_iaminstanceprofile.json: (EC2Instance)-[:STS_ASSUMEROLE_ALLOW]->
    (AWSRole) via the instance profile's trailing role name.

    The reference suffix-match (``r.arn ENDS WITH role_name``) scoped to the
    instance's account restates as an equi-join on (account_id, role_name) —
    the shuffle-key form that scales (no theta-join)."""
    # stage layout: the edge upsert checkpoints under ":edges"; the job's own
    # stage name commits LAST (with the stale-edge cleanup) so a crash
    # between the two legs resumes into the cleanup, not past it.
    stage = "analysis:aws_ec2_iaminstanceprofile"
    inst = (
        store.nodes(labels=["EC2Instance"])
        .where(F.element_at("props", "iaminstanceprofile").isNotNull())
        .select(
            F.col("id").alias("instance_id"),
            F.element_at("props", "account_id").alias("account_id"),
            F.regexp_extract(
                F.element_at("props", "iaminstanceprofile"), r"([^/]+)$", 1
            ).alias("role_name"),
        )
    )
    roles = store.nodes(labels=["AWSRole"]).select(
        F.col("id").alias("role_arn"),
        F.element_at("props", "account_id").alias("account_id"),
        F.element_at("props", "name").alias("role_name"),
    )
    edges = inst.join(F.broadcast(roles), ["account_id", "role_name"], "inner").select(
        F.col("instance_id").alias("src_id"),
        F.lit("EC2Instance").alias("src_label"),
        F.lit("STS_ASSUMEROLE_ALLOW").alias("rel_label"),
        F.col("role_arn").alias("dst_id"),
        F.lit("AWSRole").alias("dst_label"),
        F.lit(None).cast("map<string,string>").alias("props"),
        F.lit(None).cast("long").alias("firstseen"),
        F.lit(int(update_tag)).alias("lastupdated"),
    ).dropDuplicates(["src_id", "rel_label", "dst_id"])
    if not store.stage_done(stage + ":edges", update_tag):
        store.upsert(None, edges, stage + ":edges", update_tag)
    _cleanup_rel(store, "STS_ASSUMEROLE_ALLOW", update_tag, stage)


def link_humans(
    store: GraphStore, spark: SparkSession, sf_dir: str, update_tag: int
) -> None:
    """gsuite_human_link.json analog on the Okta provider:
    (Human)-[:IDENTITY_OKTA]->(OktaUser) where human.email = okta.login,
    plus the stale-edge delete leg."""
    stage = "analysis:human_link"
    humans = store.nodes(labels=["Human"]).select(F.col("id").alias("email"))
    okta = store.nodes(labels=["OktaUser"]).select(
        F.col("id").alias("okta_id"), F.element_at("props", "login").alias("email")
    )
    edges = humans.join(okta, "email", "inner").select(
        F.col("email").alias("src_id"),
        F.lit("Human").alias("src_label"),
        F.lit("IDENTITY_OKTA").alias("rel_label"),
        F.col("okta_id").alias("dst_id"),
        F.lit("OktaUser").alias("dst_label"),
        F.lit(None).cast("map<string,string>").alias("props"),
        F.lit(None).cast("long").alias("firstseen"),
        F.lit(int(update_tag)).alias("lastupdated"),
    ).dropDuplicates(["src_id", "rel_label", "dst_id"])
    if not store.stage_done(stage + ":edges", update_tag):
        store.upsert(None, edges, stage + ":edges", update_tag)
    _cleanup_rel(store, "IDENTITY_OKTA", update_tag, stage)
