"""Okta module: orgs, groups, users, memberships, and the Okta->AWS SAML
bridge.

Parity:
  * group/user load + MEMBER_OF_OKTA_GROUP — reference okta/groups.py:168-249
  * SAML mapping: regex-extract role + account from the group name, build
    the role ARN, join to AWSRole, MERGE ALLOWED_BY, then the multi-hop
    CAN_ASSUME_ROLE for humans — reference okta/awssaml.py:23-124.
    The reference's Python regex loop becomes a native ``regexp_extract``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cartography_spark.core.loader import LabeledFrame, compile_edges, compile_nodes
from cartography_spark.core.model import (
    LinkDirection,
    NodeSchema,
    PropertyRef,
    RelSchema,
    TargetNodeMatcher,
)
from cartography_spark.core.store import GraphStore

ORG_SCHEMA = NodeSchema(label="OktaOrganization", id=PropertyRef("id"))

ORG_REL = RelSchema(
    target_label="OktaOrganization",
    rel_label="RESOURCE",
    direction=LinkDirection.INWARD,
    matcher=TargetNodeMatcher({"id": PropertyRef("org_id")}),
)

GROUP_SCHEMA = NodeSchema(
    label="OktaGroup",
    id=PropertyRef("id"),
    properties={"name": PropertyRef("name")},
    sub_resource_rel=ORG_REL,
)

USER_SCHEMA = NodeSchema(
    label="OktaUser",
    id=PropertyRef("id"),
    properties={
        "login": PropertyRef("login", extra_index=True),
        "first_name": PropertyRef("first_name"),
        "last_name": PropertyRef("last_name"),
        # round-5 profile tranche (reference intel/okta/users.py:135-155)
        "email": PropertyRef("email"),
        "created": PropertyRef("created"),
        "last_login": PropertyRef("last_login"),
        "password_changed": PropertyRef("password_changed"),
    },
    sub_resource_rel=ORG_REL,
)

MEMBER_SCHEMA = NodeSchema(
    label="OktaUser",
    id=PropertyRef("user_id"),
    other_rels=(
        RelSchema(
            target_label="OktaGroup",
            rel_label="MEMBER_OF_OKTA_GROUP",
            direction=LinkDirection.OUTWARD,
            matcher=TargetNodeMatcher({"id": PropertyRef("group_id")}),
        ),
    ),
)

# Group-name grammar "aws#{role}#{accountid}" (the reference's default regex
# okta/awssaml.py:23-37 parses "aws#{{accountid}}#{{role}}"-family names).
SAML_RE = r"^aws#([^#]+)#(\d{12})$"


def sync_okta(
    store: GraphStore,
    orgs: DataFrame,
    groups: DataFrame,
    users: DataFrame,
    members: DataFrame,
    update_tag: int,
) -> None:
    if not store.stage_done("okta:orgs", update_tag):
        store.upsert(compile_nodes(orgs, ORG_SCHEMA, update_tag), None, "okta:orgs", update_tag)
    for stage, df, schema in (
        ("okta:groups", groups, GROUP_SCHEMA),
        ("okta:users", users, USER_SCHEMA),
    ):
        if store.stage_done(stage, update_tag):
            continue
        store.upsert(
            compile_nodes(df, schema, update_tag),
            compile_edges(df, schema, store.nodes, update_tag),
            stage,
            update_tag,
        )
    if not store.stage_done("okta:members", update_tag):
        store.upsert(
            None,
            compile_edges(members, MEMBER_SCHEMA, store.nodes, update_tag),
            "okta:members",
            update_tag,
        )


def sync_saml(store: GraphStore, update_tag: int) -> None:
    """(AWSRole)<-[:ALLOWED_BY]-(OktaGroup) from group-name regex, then the
    transitive (OktaUser)-[:CAN_ASSUME_ROLE]->(AWSRole) hop."""
    stage = "okta:saml"
    if store.stage_done(stage, update_tag):
        return
    nodes = store.nodes(labels=["OktaGroup", "AWSRole"])
    groups = nodes.where(F.col("label") == "OktaGroup").select(
        F.col("id").alias("group_id"), F.element_at("props", "name").alias("gname")
    )
    mapped = groups.select(
        "group_id",
        F.concat(
            F.lit("arn:aws:iam::"),
            F.regexp_extract("gname", SAML_RE, 2),
            F.lit(":role/"),
            F.regexp_extract("gname", SAML_RE, 1),
        ).alias("role_arn"),
    ).where(F.regexp_extract("gname", SAML_RE, 2) != "")

    roles = nodes.where(F.col("label") == "AWSRole").select(F.col("id").alias("role_arn"))
    allowed = mapped.join(F.broadcast(roles), "role_arn", "inner")

    allowed_edges = allowed.select(
        F.col("role_arn").alias("src_id"),
        F.lit("AWSRole").alias("src_label"),
        F.lit("ALLOWED_BY").alias("rel_label"),
        F.col("group_id").alias("dst_id"),
        F.lit("OktaGroup").alias("dst_label"),
        F.lit(None).cast("map<string,string>").alias("props"),
        F.lit(None).cast("long").alias("firstseen"),
        F.lit(int(update_tag)).alias("lastupdated"),
    ).dropDuplicates(["src_id", "rel_label", "dst_id"])

    # Multi-hop: user -MEMBER_OF_OKTA_GROUP-> group -ALLOWED_BY- role
    memb = store.edges(rel_labels=["MEMBER_OF_OKTA_GROUP"]).select(
        F.col("src_id").alias("user_id"), F.col("dst_id").alias("group_id")
    )
    can_assume = memb.join(F.broadcast(allowed), "group_id", "inner").select(
        F.col("user_id").alias("src_id"),
        F.lit("OktaUser").alias("src_label"),
        F.lit("CAN_ASSUME_ROLE").alias("rel_label"),
        F.col("role_arn").alias("dst_id"),
        F.lit("AWSRole").alias("dst_label"),
        F.lit(None).cast("map<string,string>").alias("props"),
        F.lit(None).cast("long").alias("firstseen"),
        F.lit(int(update_tag)).alias("lastupdated"),
    ).dropDuplicates(["src_id", "rel_label", "dst_id"])

    store.upsert(
        None,
        LabeledFrame(
            allowed_edges.unionByName(can_assume), ["ALLOWED_BY", "CAN_ASSUME_ROLE"]
        ),
        stage,
        update_tag,
    )


# --- round-3 breadth: applications, factors, admin roles, trusted origins ---

APPLICATION_SCHEMA = NodeSchema(
    label="OktaApplication",
    id=PropertyRef("id"),
    properties={"name": PropertyRef("name"), "app_label": PropertyRef("label")},
    sub_resource_rel=ORG_REL,
    other_rels=(
        # (group)-[:APPLICATION]->(app) — reference applications.py:336-342
        RelSchema(
            target_label="OktaGroup",
            rel_label="APPLICATION",
            direction=LinkDirection.INWARD,
            matcher=TargetNodeMatcher({"id": PropertyRef("group_id")}),
        ),
    ),
)

REPLY_URI_SCHEMA = NodeSchema(
    # (uri:ReplyUri)<-[:REPLYURI]-(app) — reference applications.py:370-379
    label="ReplyUri",
    id=PropertyRef("reply_uri"),
    other_rels=(
        RelSchema(
            target_label="OktaApplication",
            rel_label="REPLYURI",
            direction=LinkDirection.INWARD,
            matcher=TargetNodeMatcher({"id": PropertyRef("id")}),
        ),
    ),
)

APP_USER_SCHEMA = NodeSchema(
    # (user)-[:APPLICATION]->(app) — reference applications.py:304-311
    label="OktaUser",
    id=PropertyRef("user_id"),
    other_rels=(
        RelSchema(
            target_label="OktaApplication",
            rel_label="APPLICATION",
            direction=LinkDirection.OUTWARD,
            matcher=TargetNodeMatcher({"id": PropertyRef("app_id")}),
        ),
    ),
)

FACTOR_SCHEMA = NodeSchema(
    # OktaUserFactor{id}, (user)-[:FACTOR]->(factor) — factors.py:107-121
    label="OktaUserFactor",
    id=PropertyRef("factor_id"),
    properties={
        "factor_type": PropertyRef("factor_type"),
        "provider": PropertyRef("provider"),
    },
    other_rels=(
        RelSchema(
            target_label="OktaUser",
            rel_label="FACTOR",
            direction=LinkDirection.INWARD,
            matcher=TargetNodeMatcher({"id": PropertyRef("user_id")}),
        ),
    ),
)

ADMIN_ROLE_SCHEMA = NodeSchema(
    # OktaAdministrationRole{id: role type} is SHARED across grantees
    # (roles.py:99-141 MERGEs by type) — the compiler's dedupe-by-key window
    # collapses the per-grant rows into one node per type.
    label="OktaAdministrationRole",
    id=PropertyRef("role_type"),
    properties={"label": PropertyRef("role_label")},
    sub_resource_rel=ORG_REL,
    other_rels=(
        RelSchema(
            target_label="OktaUser",
            rel_label="MEMBER_OF_OKTA_ROLE",
            direction=LinkDirection.INWARD,
            matcher=TargetNodeMatcher({"id": PropertyRef("user_id")}),
        ),
    ),
)

TRUSTED_ORIGIN_SCHEMA = NodeSchema(
    # OktaTrustedOrigin{id} — origins.py:77-93
    label="OktaTrustedOrigin",
    id=PropertyRef("origin_id"),
    properties={"name": PropertyRef("name"), "origin": PropertyRef("origin_url")},
    sub_resource_rel=ORG_REL,
)


def sync_okta_breadth(
    store: GraphStore,
    applications: DataFrame,
    app_users: DataFrame,
    factors: DataFrame,
    admin_roles: DataFrame,
    origins: DataFrame,
    update_tag: int,
) -> None:
    """Applications (+reply URIs, +group/user assignments), MFA factors,
    admin roles, trusted origins — the reference's remaining okta/ modules
    (applications.py, factors.py, roles.py, origins.py)."""
    if not store.stage_done("okta:applications", update_tag):
        nodes = compile_nodes(applications, APPLICATION_SCHEMA, update_tag).unionByName(
            compile_nodes(applications, REPLY_URI_SCHEMA, update_tag)
        )
        edges = compile_edges(applications, APPLICATION_SCHEMA, store.nodes, update_tag)
        store.upsert(nodes, edges, "okta:applications", update_tag)
    if not store.stage_done("okta:app_links", update_tag):
        # reply-uri + user->app edges need the app nodes committed/visible
        edges = compile_edges(
            applications, REPLY_URI_SCHEMA, store.nodes, update_tag
        ).unionByName(
            compile_edges(app_users, APP_USER_SCHEMA, store.nodes, update_tag)
        )
        store.upsert(None, edges, "okta:app_links", update_tag)
    if not store.stage_done("okta:factors", update_tag):
        store.upsert(
            compile_nodes(factors, FACTOR_SCHEMA, update_tag),
            compile_edges(factors, FACTOR_SCHEMA, store.nodes, update_tag),
            "okta:factors",
            update_tag,
        )
    if not store.stage_done("okta:roles", update_tag):
        store.upsert(
            compile_nodes(admin_roles, ADMIN_ROLE_SCHEMA, update_tag),
            compile_edges(admin_roles, ADMIN_ROLE_SCHEMA, store.nodes, update_tag),
            "okta:roles",
            update_tag,
        )
    if not store.stage_done("okta:origins", update_tag):
        store.upsert(
            compile_nodes(origins, TRUSTED_ORIGIN_SCHEMA, update_tag),
            compile_edges(origins, TRUSTED_ORIGIN_SCHEMA, store.nodes, update_tag),
            "okta:origins",
            update_tag,
        )
