"""Native ARN parsing functions (reference parity: iam.py:832-845,
resourcegroupstaggingapi.py:18-56 — per-row Python there, codegen here)."""

from pyspark.sql import functions as F

from cartography_spark.functions.arn import (
    arn_account,
    arn_region,
    arn_resource,
    arn_service,
    is_service_principal,
    short_id,
)

CASES = [
    ("arn:aws:iam::000000000012:user/user-7", "iam", "", "000000000012", "user/user-7", "user-7"),
    (
        "arn:aws:elasticmapreduce:us-east-1:000000000003:cluster/j-55",
        "elasticmapreduce", "us-east-1", "000000000003", "cluster/j-55", "j-55",
    ),
    ("arn:aws:s3:::bucket-9", "s3", "", "", "bucket-9", "bucket-9"),
    (
        "arn:aws:ec2:us-west-2:000000000001:instance/i-abc123",
        "ec2", "us-west-2", "000000000001", "instance/i-abc123", "i-abc123",
    ),
]


def test_arn_parsers(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], ["arn"])
    got = df.select(
        "arn",
        arn_service(F.col("arn")).alias("svc"),
        arn_region(F.col("arn")).alias("reg"),
        arn_account(F.col("arn")).alias("acct"),
        arn_resource(F.col("arn")).alias("res"),
        short_id(F.col("arn")).alias("sid"),
    ).collect()
    by_arn = {r.arn: r for r in got}
    for arn, svc, reg, acct, res, sid in CASES:
        r = by_arn[arn]
        assert (r.svc, r.reg, r.acct, r.res, r.sid) == (svc, reg, acct, res, sid)


def test_service_principal_detection(spark):
    df = spark.createDataFrame(
        [("ec2.amazonaws.com",), ("arn:aws:iam::000000000001:root",)], ["p"]
    )
    rows = df.select("p", is_service_principal(F.col("p")).alias("svc")).collect()
    assert {(r.p, r.svc) for r in rows} == {
        ("ec2.amazonaws.com", True),
        ("arn:aws:iam::000000000001:root", False),
    }
