"""Analysis passes: exposure range join, drift states, orphan cleanup."""

from pyspark.sql import functions as F

from cartography_spark.analysis.drift import (
    detect_drift,
    drift_between_states,
    save_state,
    split_multi_value,
)
from cartography_spark.analysis.exposure import exposed_instances, mark_exposure
from tests.conftest import SF_DIR

T1, T2 = 111111111, 222222222


def test_exposure_range_join_matches_naive(spark):
    """The bin-bucketed range join must equal the naive theta-join."""
    from cartography_spark.analysis.exposure import instances, security_group_rules

    rules = security_group_rules(spark, SF_DIR).where(F.col("cidr") == "0.0.0.0/0")
    inst = instances(spark, SF_DIR)
    naive = (
        inst.join(rules, "sg_id")
        .where(
            (F.col("listener_port") >= F.col("fromport"))
            & (F.col("listener_port") <= F.col("toport"))
        )
        .select("instance_id", "sg_id", "listener_port")
        .distinct()
    )
    binned = exposed_instances(spark, SF_DIR)
    assert binned.exceptAll(naive).count() == 0
    assert naive.exceptAll(binned).count() == 0
    assert binned.count() > 0  # non-vacuous


def test_mark_exposure_list_property(spark, store):
    """A4 list-property accumulation on the graph."""
    inst = exposed_instances(spark, SF_DIR).limit(1).collect()
    nodes = spark.createDataFrame(
        [(inst[0].instance_id, "EC2Instance", None, None, None, T1)],
        "id string, label string, props map<string,string>, extra_labels array<string>, firstseen long, lastupdated long",
    )
    from cartography_spark.core.loader import empty_edges

    store.commit(nodes, empty_edges(spark), "seed", T1)
    mark_exposure(store, spark, SF_DIR, T1)
    row = store.nodes().where(F.col("id") == inst[0].instance_id).collect()[0]
    assert row.props["exposed_internet_type"] == '["direct"]'


def test_drift_states_roundtrip(spark, tmp_path):
    a = spark.createDataFrame([("x", "1"), ("y", "2")], ["k", "v"])
    b = spark.createDataFrame([("x", "1"), ("z", "3")], ["k", "v"])
    save_state(a, str(tmp_path), "det", T1)
    save_state(b, str(tmp_path), "det", T2)
    d = drift_between_states(spark, str(tmp_path), "det", T1, T2)
    got = {(r.k, r.v, r.direction) for r in d.collect()}
    assert got == {("z", "3", "new"), ("y", "2", "missing")}


def test_split_multi_value(spark):
    df = spark.createDataFrame([("a|b|c",)], ["vals"])
    row = split_multi_value(df, "vals").collect()[0]
    assert row.vals == ["a", "b", "c"]


def test_orphan_cleanup(spark, store):
    """J12: principals with no account edge get deleted."""
    from cartography_spark.core.cleanup import cleanup_orphans
    from cartography_spark.core.loader import empty_edges

    nodes = spark.createDataFrame(
        [
            ("arn:p1", "AWSPrincipal", None, None, None, T1),
            ("ec2.amazonaws.com", "AWSPrincipal", None, None, None, T1),
            ("000000000001", "AWSAccount", None, None, None, T1),
        ],
        "id string, label string, props map<string,string>, extra_labels array<string>, firstseen long, lastupdated long",
    )
    edges = spark.createDataFrame(
        [
            ("000000000001", "AWSAccount", "RESOURCE", "arn:p1", "AWSPrincipal", None, None, T1),
        ],
        "src_id string, src_label string, rel_label string, dst_id string, dst_label string, props map<string,string>, firstseen long, lastupdated long",
    )
    store.commit(nodes, edges, "seed", T1)
    cleanup_orphans(store, "AWSPrincipal", "AWSAccount", T1)
    left = {r.id for r in store.nodes().where(F.col("label") == "AWSPrincipal").collect()}
    assert left == {"arn:p1"}
