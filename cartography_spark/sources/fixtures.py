"""Deterministic KG fixture tables derived from the driver's parquet data.

The reference's integration tests feed canned API dicts (e.g.
tests/data/aws/emr.py DESCRIBE_CLUSTERS) into each module's loader.  Our
equivalents are *pure derivations* of the sandbox's TPC-H-ish parquet tables
(`/root/testdata/sf*/`): every formula below is simple modular arithmetic +
string concat, so the DuckDB oracle in ``__spark_entry__.py`` can recompute
the exact same rows in ANSI SQL.  No randomness, no external data (seed-free
determinism by construction).

Naming formulas (shared contract with the oracle SQL — keep in sync):
  ACCT(k)       = lpad(k, 12, '0')                       AWS account id
  user arn      = arn:aws:iam::ACCT(c_nationkey):user/user-{c_custkey}
  user email    = user-{c_custkey}@corp-{c_nationkey}.example.com
  group arn     = arn:aws:iam::ACCT(n):group/group-{n}-{c_custkey % 5}
  role arn      = arn:aws:iam::ACCT(s_nationkey):role/role-{s_suppkey}
  trust spn     = arn:aws:iam::ACCT((s_suppkey*7) % 25):root
  emr arn       = arn:aws:elasticmapreduce:us-east-1:ACCT(s_nationkey):cluster/j-{s_suppkey}
  bucket arn    = arn:aws:s3:::bucket-{p_partkey % 20}
  okta org      = okta-org-{r_regionkey}
  saml group    = aws#role-{s_suppkey}#ACCT(s_nationkey)   (s_suppkey % 4 == 1)

Two-run scenario (FIXTURES.md §9): variant "t1" is the full population;
variant "t2" drops rows where key % 10 == 7 and mutates ``path`` where
key % 10 == 3 — exercising stale-cleanup + firstseen preservation.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

T1_TAG = 111111111
T2_TAG = 222222222


def _acct(col):
    return F.lpad(col.cast("string"), 12, "0")


def plan_memo(fn):
    """Memoize a pure plan-constructor ``fn(spark, sf_dir, *scalars)``.

    Fixture derivations are deterministic functions of (session, sf_dir,
    variant): the returned DataFrame is an immutable logical-plan handle, so
    reusing it is always safe.  A sync plans the same fixtures dozens of
    times and each construction costs 50-300 ms of driver py4j round-trips;
    memoization makes every repeat free and lets Spark reuse the analyzed
    plan + FileIndex.  Keyed on ``id(spark)`` — sessions here are few and
    process-long-lived (a stopped session's stale entries would fail loudly
    on first use, never silently).
    """
    cache: dict = {}

    @functools.wraps(fn)
    def wrapper(spark, sf_dir, *args, **kwargs):
        key = (id(spark), sf_dir, args, tuple(sorted(kwargs.items())))
        if key not in cache:
            cache[key] = fn(spark, sf_dir, *args, **kwargs)
        return cache[key]

    return wrapper


@plan_memo
def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan handle, memoized per (session, path) — re-running
    ``spark.read.parquet`` re-infers the footer schema on the driver each
    time (~70 ms of py4j latency per call)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _variant_filter(df: DataFrame, key_col: str, variant: str) -> DataFrame:
    if variant == "t2":
        return df.where((F.col(key_col) % 10) != 7)
    return df


@plan_memo
def aws_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One AWSAccount per nation.  Columns: id, name."""
    n = read_table(spark, sf_dir, "nation")
    return n.select(
        _acct(F.col("n_nationkey")).alias("id"), F.col("n_name").alias("name")
    )


@plan_memo
def iam_users(spark: SparkSession, sf_dir: str, variant: str = "t1") -> DataFrame:
    """IAM users from customer.  Columns: arn,name,email,userid,path,account_id.

    Shapes mirror the reference fixture tests/data/aws/iam (ListUsers).
    """
    c = _variant_filter(read_table(spark, sf_dir, "customer"), "c_custkey", variant)
    path = (
        F.when((F.col("c_custkey") % 10) == 3, F.lit("/renamed/")).otherwise(F.lit("/"))
        if variant == "t2"
        else F.lit("/")
    )
    return c.select(
        F.concat(
            F.lit("arn:aws:iam::"), _acct(F.col("c_nationkey")), F.lit(":user/user-"),
            F.col("c_custkey").cast("string"),
        ).alias("arn"),
        F.concat(F.lit("user-"), F.col("c_custkey").cast("string")).alias("name"),
        F.concat(
            F.lit("user-"), F.col("c_custkey").cast("string"), F.lit("@corp-"),
            F.col("c_nationkey").cast("string"), F.lit(".example.com"),
        ).alias("email"),
        F.concat(F.lit("AIDA"), F.col("c_custkey").cast("string")).alias("userid"),
        path.alias("path"),
        _acct(F.col("c_nationkey")).alias("account_id"),
    )


@plan_memo
def iam_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five IAM groups per nation.  Columns: arn, name, account_id."""
    c = read_table(spark, sf_dir, "customer")
    return (
        c.select(
            F.col("c_nationkey").alias("n"), (F.col("c_custkey") % 5).alias("g")
        )
        .distinct()
        .select(
            F.concat(
                F.lit("arn:aws:iam::"), _acct(F.col("n")), F.lit(":group/group-"),
                F.col("n").cast("string"), F.lit("-"), F.col("g").cast("string"),
            ).alias("arn"),
            F.concat(
                F.lit("group-"), F.col("n").cast("string"), F.lit("-"),
                F.col("g").cast("string"),
            ).alias("name"),
            _acct(F.col("n")).alias("account_id"),
        )
    )


@plan_memo
def iam_group_memberships(spark: SparkSession, sf_dir: str, variant: str = "t1") -> DataFrame:
    """user arn -> group arn (each user belongs to its nation's custkey%5 group)."""
    c = _variant_filter(read_table(spark, sf_dir, "customer"), "c_custkey", variant)
    return c.select(
        F.concat(
            F.lit("arn:aws:iam::"), _acct(F.col("c_nationkey")), F.lit(":user/user-"),
            F.col("c_custkey").cast("string"),
        ).alias("user_arn"),
        F.concat(
            F.lit("arn:aws:iam::"), _acct(F.col("c_nationkey")), F.lit(":group/group-"),
            F.col("c_nationkey").cast("string"), F.lit("-"),
            (F.col("c_custkey") % 5).cast("string"),
        ).alias("group_arn"),
    )


@plan_memo
def iam_roles(spark: SparkSession, sf_dir: str, variant: str = "t1") -> DataFrame:
    """IAM roles from supplier.  Columns: arn, name, account_id,
    trust_principals array<struct<type string, value string>>.

    Every role trusts one cross-account root principal; every third also
    trusts the EC2 service principal (mirrors the flattened
    AssumeRolePolicyDocument of reference iam.py:303-315); every tenth
    (key % 10 == 9) additionally trusts a root principal in an account
    OUTSIDE the 25-account sync scope (accounts 25-27) — the positives for
    the aws_foreign_accounts analysis.
    """
    s = _variant_filter(read_table(spark, sf_dir, "supplier"), "s_suppkey", variant)
    spn = F.concat(
        F.lit("arn:aws:iam::"), _acct((F.col("s_suppkey") * 7) % 25), F.lit(":root")
    )
    aws_p = F.struct(F.lit("AWS").alias("type"), spn.alias("value"))
    svc_p = F.struct(F.lit("Service").alias("type"), F.lit("ec2.amazonaws.com").alias("value"))
    foreign_spn = F.concat(
        F.lit("arn:aws:iam::"), _acct(F.lit(25) + (F.col("s_suppkey") % 3)), F.lit(":root")
    )
    foreign_p = F.struct(F.lit("AWS").alias("type"), foreign_spn.alias("value"))
    base = F.when((F.col("s_suppkey") % 3) == 0, F.array(aws_p, svc_p)).otherwise(
        F.array(aws_p)
    )
    return s.select(
        F.concat(
            F.lit("arn:aws:iam::"), _acct(F.col("s_nationkey")), F.lit(":role/role-"),
            F.col("s_suppkey").cast("string"),
        ).alias("arn"),
        F.concat(F.lit("role-"), F.col("s_suppkey").cast("string")).alias("name"),
        _acct(F.col("s_nationkey")).alias("account_id"),
        F.when((F.col("s_suppkey") % 10) == 9, F.concat(base, F.array(foreign_p)))
        .otherwise(base)
        .alias("trust_principals"),
    )


@plan_memo
def emr_clusters(spark: SparkSession, sf_dir: str, variant: str = "t1") -> DataFrame:
    """EMR clusters from supplier (cf. reference tests/data/aws/emr.py:4-60)."""
    s = _variant_filter(read_table(spark, sf_dir, "supplier"), "s_suppkey", variant)
    return s.select(
        F.concat(F.lit("j-"), F.col("s_suppkey").cast("string")).alias("Id"),
        F.concat(
            F.lit("arn:aws:elasticmapreduce:us-east-1:"), _acct(F.col("s_nationkey")),
            F.lit(":cluster/j-"), F.col("s_suppkey").cast("string"),
        ).alias("ClusterArn"),
        F.concat(F.lit("cluster-"), F.col("s_name")).alias("Name"),
        F.lit("EMR_DefaultRole").alias("ServiceRole"),
        ((F.col("s_suppkey") % 2) == 0).alias("TerminationProtected"),
        F.lit("emr-6.10.0").alias("ReleaseLabel"),
        _acct(F.col("s_nationkey")).alias("account_id"),
        F.lit("us-east-1").alias("region"),
    )


@plan_memo
def s3_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20 S3 buckets (p_partkey % 20).  Columns: arn, name, account_id."""
    p = read_table(spark, sf_dir, "part")
    return (
        p.select((F.col("p_partkey") % 20).alias("b"))
        .distinct()
        .select(
            F.concat(F.lit("arn:aws:s3:::bucket-"), F.col("b").cast("string")).alias("arn"),
            F.concat(F.lit("bucket-"), F.col("b").cast("string")).alias("name"),
            _acct(F.col("b") % 5).alias("account_id"),
        )
    )


@plan_memo
def iam_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One inline policy per role.  Columns: policy_id, principal_arn, name."""
    r = iam_roles(spark, sf_dir)
    return r.select(
        F.concat(F.col("arn"), F.lit("/inline_policy/default")).alias("policy_id"),
        F.col("arn").alias("principal_arn"),
        F.lit("default").alias("name"),
    )


@plan_memo
def iam_policy_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy statements with wildcard actions/resources.

    Even suppliers get s3 read; odd get sts:AssumeRole on *; every 5th gets
    resource '*'; every 7th also gets a Deny on bucket-3* (drives the
    allow/deny precedence of the policy-eval theta-join, reference
    permission_relationships.py:21-130).
    Columns: policy_id, statement_id, effect, action array, resource array.
    """
    s = read_table(spark, sf_dir, "supplier")
    role_arn = F.concat(
        F.lit("arn:aws:iam::"), _acct(F.col("s_nationkey")), F.lit(":role/role-"),
        F.col("s_suppkey").cast("string"),
    )
    pid = F.concat(role_arn, F.lit("/inline_policy/default"))
    allow = s.select(
        pid.alias("policy_id"),
        F.concat(pid, F.lit("/statement/1")).alias("statement_id"),
        F.lit("Allow").alias("effect"),
        F.when(
            (F.col("s_suppkey") % 2) == 0,
            F.array(F.lit("s3:GetObject"), F.lit("s3:ListBucket")),
        )
        .otherwise(F.array(F.lit("sts:AssumeRole")))
        .alias("action"),
        F.when((F.col("s_suppkey") % 5) == 0, F.array(F.lit("*")))
        .otherwise(
            F.array(
                F.concat(
                    F.lit("arn:aws:s3:::bucket-"),
                    (F.col("s_suppkey") % 20).cast("string"), F.lit("*"),
                )
            )
        )
        .alias("resource"),
    )
    deny = (
        s.where((F.col("s_suppkey") % 7) == 0)
        .select(
            pid.alias("policy_id"),
            F.concat(pid, F.lit("/statement/2")).alias("statement_id"),
            F.lit("Deny").alias("effect"),
            F.array(F.lit("s3:*")).alias("action"),
            F.array(F.lit("arn:aws:s3:::bucket-3*")).alias("resource"),
        )
    )
    return allow.unionByName(deny)


@plan_memo
def resource_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag mappings on even EMR clusters.

    Columns: ResourceARN, resource_type, Tags array<struct<Key,Value>> —
    the nested shape the reference double-UNWINDs
    (resourcegroupstaggingapi.py:151-168).
    """
    s = read_table(spark, sf_dir, "supplier").where((F.col("s_suppkey") % 2) == 0)
    env = (
        F.when((F.col("s_suppkey") % 3) == 0, F.lit("prod"))
        .when((F.col("s_suppkey") % 3) == 1, F.lit("stage"))
        .otherwise(F.lit("dev"))
    )
    return s.select(
        F.concat(
            F.lit("arn:aws:elasticmapreduce:us-east-1:"), _acct(F.col("s_nationkey")),
            F.lit(":cluster/j-"), F.col("s_suppkey").cast("string"),
        ).alias("ResourceARN"),
        F.lit("emr").alias("resource_type"),
        F.array(
            F.struct(F.lit("env").alias("Key"), env.alias("Value")),
            F.struct(
                F.lit("team").alias("Key"),
                F.concat(F.lit("team-"), (F.col("s_suppkey") % 7).cast("string")).alias("Value"),
            ),
        ).alias("Tags"),
    )


@plan_memo
def okta_orgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = read_table(spark, sf_dir, "region")
    return r.select(
        F.concat(F.lit("okta-org-"), F.col("r_regionkey").cast("string")).alias("id")
    )


@plan_memo
def okta_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation team groups + SAML-mapped AWS role groups.

    SAML names follow ``aws#{role}#{accountid}`` so the awssaml regex path
    (reference okta/awssaml.py:23-46) has real positives.
    Columns: id, name, org_id.
    """
    n = read_table(spark, sf_dir, "nation")
    team = n.select(
        F.concat(F.lit("og-n-"), F.col("n_nationkey").cast("string")).alias("id"),
        F.concat(F.lit("team-"), F.col("n_name")).alias("name"),
        F.concat(F.lit("okta-org-"), F.col("n_regionkey").cast("string")).alias("org_id"),
    )
    s = read_table(spark, sf_dir, "supplier").where((F.col("s_suppkey") % 4) == 1)
    saml = s.select(
        F.concat(F.lit("og-s-"), F.col("s_suppkey").cast("string")).alias("id"),
        F.concat(
            F.lit("aws#role-"), F.col("s_suppkey").cast("string"), F.lit("#"),
            _acct(F.col("s_nationkey")),
        ).alias("name"),
        F.concat(F.lit("okta-org-"), (F.col("s_nationkey") % 5).cast("string")).alias("org_id"),
    )
    return team.unionByName(saml)


@plan_memo
def okta_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even customers are also Okta users; login == the IAM user's email —
    the cross-system identity that canonicalization must merge.
    Columns: id, login, first_name, last_name, org_id.
    """
    c = read_table(spark, sf_dir, "customer").where((F.col("c_custkey") % 2) == 0)
    return c.select(
        F.concat(F.lit("okta-"), F.col("c_custkey").cast("string")).alias("id"),
        F.concat(
            F.lit("user-"), F.col("c_custkey").cast("string"), F.lit("@corp-"),
            F.col("c_nationkey").cast("string"), F.lit(".example.com"),
        ).alias("login"),
        F.concat(F.lit("First"), F.col("c_custkey").cast("string")).alias("first_name"),
        F.concat(F.lit("Last"), F.col("c_custkey").cast("string")).alias("last_name"),
        F.concat(F.lit("okta-org-"), (F.col("c_nationkey") % 5).cast("string")).alias("org_id"),
    )


@plan_memo
def okta_group_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each okta user joins its nation team group, plus the nation's first
    SAML group when one exists.  Columns: group_id, user_id."""
    c = read_table(spark, sf_dir, "customer").where((F.col("c_custkey") % 2) == 0)
    team = c.select(
        F.concat(F.lit("og-n-"), F.col("c_nationkey").cast("string")).alias("group_id"),
        F.concat(F.lit("okta-"), F.col("c_custkey").cast("string")).alias("user_id"),
    )
    s = (
        read_table(spark, sf_dir, "supplier")
        .where((F.col("s_suppkey") % 4) == 1)
        .groupBy("s_nationkey")
        .agg(F.min("s_suppkey").alias("min_supp"))
    )
    saml = c.join(s, c["c_nationkey"] == s["s_nationkey"], "inner").select(
        F.concat(F.lit("og-s-"), F.col("min_supp").cast("string")).alias("group_id"),
        F.concat(F.lit("okta-"), F.col("c_custkey").cast("string")).alias("user_id"),
    )
    return team.unionByName(saml)


@plan_memo
def github_repos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 50th part is a repo.  Columns: id(url), name, fullname."""
    p = read_table(spark, sf_dir, "part").where((F.col("p_partkey") % 50) == 0)
    return p.select(
        F.concat(F.lit("https://github.com/corp/repo-"), F.col("p_partkey").cast("string")).alias("id"),
        F.concat(F.lit("repo-"), F.col("p_partkey").cast("string")).alias("name"),
        F.concat(F.lit("corp/repo-"), F.col("p_partkey").cast("string")).alias("fullname"),
    )


@plan_memo
def github_requirements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """requirements.txt lines per repo (reference github/repos.py:296-348
    parses these from text; we derive the already-parsed canonical rows and
    exercise the parser separately in ops tests).
    Columns: repo_url, lib_id, lib_name, version (nullable)."""
    p = read_table(spark, sf_dir, "part").where((F.col("p_partkey") % 50) == 0)
    pinned = p.select(
        F.concat(F.lit("https://github.com/corp/repo-"), F.col("p_partkey").cast("string")).alias("repo_url"),
        F.concat(
            F.lit("lib-"), (F.col("p_partkey") % 13).cast("string"), F.lit("|1."),
            (F.col("p_partkey") % 3).cast("string"),
        ).alias("lib_id"),
        F.concat(F.lit("lib-"), (F.col("p_partkey") % 13).cast("string")).alias("lib_name"),
        F.concat(F.lit("1."), (F.col("p_partkey") % 3).cast("string")).alias("version"),
    )
    unpinned = p.select(
        F.concat(F.lit("https://github.com/corp/repo-"), F.col("p_partkey").cast("string")).alias("repo_url"),
        F.concat(F.lit("lib-"), (F.col("p_partkey") % 17).cast("string")).alias("lib_id"),
        F.concat(F.lit("lib-"), (F.col("p_partkey") % 17).cast("string")).alias("lib_name"),
        F.lit(None).cast("string").alias("version"),
    )
    return pinned.unionByName(unpinned)


@plan_memo
def github_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 25th customer has a GitHub handle in UPPERCASE — exercises the
    ignore_case matcher (reference models/core/common.py:25-35).
    Columns: id(url), username."""
    c = read_table(spark, sf_dir, "customer").where((F.col("c_custkey") % 25) == 0)
    return c.select(
        F.concat(F.lit("https://github.com/USER-"), F.col("c_custkey").cast("string")).alias("id"),
        F.concat(F.lit("USER-"), F.col("c_custkey").cast("string")).alias("username"),
    )


# ---------------------------------------------------------------------------
# round-2 breadth: EC2, S3 ACLs, GCP, Humans (formulas mirrored in oracle SQL)
#
#   sg id            = sg-{p_partkey}                       (p_partkey % 10 == 0)
#   sg account       = ACCT((p_partkey / 10) % 25)
#   sg rule id       = {sg_id}/inbound/tcp/{fromport}
#   instance profile = arn:aws:iam::ACCT(s_nationkey):instance-profile/role-{s_suppkey}
#                                                           (s_suppkey % 2 == 0)
#   s3 global acl    = buckets with b % 3 == 0; uri AllUsers (b%2==0) else
#                      AuthenticatedUsers; permission by b % 4
#   human            = customers with c_custkey % 3 == 0 (email key)
#   gcp project      = projects/proj-{n_nationkey}
#   gcp instance     = inst-{p_partkey} in proj-{(p_partkey/40) % 25}
#                                                           (p_partkey % 40 == 0)
#   foreign trust    = roles with s_suppkey % 10 == 9 also trust
#                      arn:aws:iam::ACCT(25 + s_suppkey % 3):root (accounts
#                      25-27 are outside the 25-account sync scope ->
#                      aws_foreign_accounts analysis positives)
# ---------------------------------------------------------------------------


@plan_memo
def ec2_security_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EC2 security groups (same population as the exposure analysis rules).
    Columns: sg_id, name, account_id."""
    p = read_table(spark, sf_dir, "part").where((F.col("p_partkey") % 10) == 0)
    return p.select(
        F.concat(F.lit("sg-"), F.col("p_partkey").cast("string")).alias("sg_id"),
        F.concat(F.lit("secgroup-"), F.col("p_partkey").cast("string")).alias("name"),
        _acct((F.col("p_partkey") / 10).cast("long") % 25).alias("account_id"),
    )


@plan_memo
def ec2_sg_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inbound rules, one per security group (reference IpPermissionInbound,
    intel/aws/ec2/security_groups.py).  Columns: rule_id, sg_id, protocol,
    fromport, toport, cidr."""
    p = read_table(spark, sf_dir, "part").where((F.col("p_partkey") % 10) == 0)
    fromport = ((F.col("p_size") % 10) * 100).cast("long")
    return p.select(
        F.concat(
            F.lit("sg-"), F.col("p_partkey").cast("string"),
            F.lit("/inbound/tcp/"), fromport.cast("string"),
        ).alias("rule_id"),
        F.concat(F.lit("sg-"), F.col("p_partkey").cast("string")).alias("sg_id"),
        F.lit("tcp").alias("protocol"),
        fromport.alias("fromport"),
        (fromport + 399).alias("toport"),
        F.when((F.col("p_partkey") % 4) == 0, F.lit("0.0.0.0/0"))
        .otherwise(F.lit("10.0.0.0/8"))
        .alias("cidr"),
    )


@plan_memo
def ec2_instances(spark: SparkSession, sf_dir: str, variant: str = "t1") -> DataFrame:
    """EC2 instances from supplier; sg membership maps onto the part-derived
    sg key space; even instances carry an IAM instance profile (drives the
    aws_ec2_iaminstanceprofile analysis).  Columns: instance_id, sg_id,
    listener_port, account_id, iaminstanceprofile."""
    s = _variant_filter(read_table(spark, sf_dir, "supplier"), "s_suppkey", variant)
    n_parts = read_table(spark, sf_dir, "part").agg(F.count(F.lit(1)).alias("n_part"))
    s = s.crossJoin(F.broadcast(n_parts))
    sg_key = (F.col("s_suppkey") * 10) % F.col("n_part")
    return s.select(
        F.concat(F.lit("i-"), F.col("s_suppkey").cast("string")).alias("instance_id"),
        F.concat(F.lit("sg-"), (sg_key - (sg_key % 10)).cast("string")).alias("sg_id"),
        ((F.col("s_suppkey") % 10) * 100 + 50).cast("long").alias("listener_port"),
        _acct(F.col("s_nationkey")).alias("account_id"),
        F.when(
            (F.col("s_suppkey") % 2) == 0,
            F.concat(
                F.lit("arn:aws:iam::"), _acct(F.col("s_nationkey")),
                F.lit(":instance-profile/role-"), F.col("s_suppkey").cast("string"),
            ),
        ).alias("iaminstanceprofile"),
    )


@plan_memo
def s3_acls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket ACL grants (reference intel/aws/s3.py parse_acl).  Every bucket
    has an owner FULL_CONTROL grant; every third bucket also has one global
    grant (AllUsers/AuthenticatedUsers) whose permission cycles by b % 4 —
    at most ONE global grant per bucket keeps the anonymous_actions list
    deterministic.  Columns: acl_id, bucket_arn, uri, permission."""
    p = read_table(spark, sf_dir, "part")
    b = p.select((F.col("p_partkey") % 20).alias("b")).distinct()
    arn = F.concat(F.lit("arn:aws:s3:::bucket-"), F.col("b").cast("string"))
    owner = b.select(
        F.concat(arn, F.lit("/acl/owner")).alias("acl_id"),
        arn.alias("bucket_arn"),
        F.lit(None).cast("string").alias("uri"),
        F.lit("FULL_CONTROL").alias("permission"),
    )
    glob = b.where((F.col("b") % 3) == 0).select(
        F.concat(arn, F.lit("/acl/global")).alias("acl_id"),
        arn.alias("bucket_arn"),
        F.when(
            (F.col("b") % 2) == 0,
            F.lit("http://acs.amazonaws.com/groups/global/AllUsers"),
        )
        .otherwise(F.lit("http://acs.amazonaws.com/groups/global/AuthenticatedUsers"))
        .alias("uri"),
        F.element_at(
            F.array(F.lit("READ"), F.lit("WRITE"), F.lit("FULL_CONTROL"), F.lit("READ_ACP")),
            (F.col("b") % 4).cast("int") + 1,
        ).alias("permission"),
    )
    return owner.unionByName(glob)


@plan_memo
def humans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HR-feed employees (the reference's Human nodes, linked to identity
    providers by gsuite_human_link.json).  Columns: email, name."""
    c = read_table(spark, sf_dir, "customer").where((F.col("c_custkey") % 3) == 0)
    return c.select(
        F.concat(
            F.lit("user-"), F.col("c_custkey").cast("string"), F.lit("@corp-"),
            F.col("c_nationkey").cast("string"), F.lit(".example.com"),
        ).alias("email"),
        F.concat(F.lit("Human "), F.col("c_custkey").cast("string")).alias("name"),
    )


@plan_memo
def gcp_projects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GCP projects, one per nation.  Columns: project_id, display_name."""
    n = read_table(spark, sf_dir, "nation")
    return n.select(
        F.concat(F.lit("projects/proj-"), F.col("n_nationkey").cast("string")).alias("project_id"),
        F.concat(F.lit("proj-"), F.col("n_name")).alias("display_name"),
    )


@plan_memo
def gcp_instances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GCE instances (reference intel/gcp/compute.py:183-221 transform shape:
    partial_uri self-link ids).  Columns: instance_id, name, project_id, zone."""
    p = read_table(spark, sf_dir, "part").where((F.col("p_partkey") % 40) == 0)
    proj = F.concat(
        F.lit("projects/proj-"), ((F.col("p_partkey") / 40).cast("long") % 25).cast("string")
    )
    return p.select(
        F.concat(
            proj, F.lit("/zones/us-east1-b/instances/inst-"), F.col("p_partkey").cast("string")
        ).alias("instance_id"),
        F.concat(F.lit("inst-"), F.col("p_partkey").cast("string")).alias("name"),
        proj.alias("project_id"),
        F.lit("us-east1-b").alias("zone"),
    )


@plan_memo
def azure_subscriptions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Azure subscriptions, one per region.  Columns: subscription_id, name."""
    r = read_table(spark, sf_dir, "region")
    return r.select(
        F.concat(F.lit("sub-"), F.col("r_regionkey").cast("string")).alias("subscription_id"),
        F.concat(F.lit("subscription-"), F.col("r_name")).alias("name"),
    )


@plan_memo
def azure_vms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Azure VMs from part (p_partkey % 35 == 0), resource-URI ids.
    Columns: vm_id, name, location, subscription_id."""
    p = read_table(spark, sf_dir, "part").where((F.col("p_partkey") % 35) == 0)
    sub = F.concat(F.lit("sub-"), ((F.col("p_partkey") / 35).cast("long") % 5).cast("string"))
    return p.select(
        F.concat(
            F.lit("/subscriptions/"), sub,
            F.lit("/resourceGroups/rg-0/providers/Microsoft.Compute/virtualMachines/vm-"),
            F.col("p_partkey").cast("string"),
        ).alias("vm_id"),
        F.concat(F.lit("vm-"), F.col("p_partkey").cast("string")).alias("name"),
        F.lit("eastus").alias("location"),
        sub.alias("subscription_id"),
    )
