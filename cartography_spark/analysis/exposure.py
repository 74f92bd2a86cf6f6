"""Internet-exposure analysis — the multi-hop + range-predicate pass.

Parity: reference data/jobs/analysis/aws_ec2_asset_exposure.json — the
Cypher walks (:IpRange{0.0.0.0/0})-->(:IpPermissionInbound)-->(sg)<-[*..2]-
(instance) and gates on the **port interval** ``listener.port >= perm.fromport
AND listener.port <= perm.toport``, then appends to the
``exposed_internet_type`` list property.  Here:

  * the bounded-depth walk unrolls into chained equi-joins;
  * the interval gate is a non-equi range-join condition — at scale this is
    the classic range-join problem: we pre-bucket ports into fixed-width
    bins and equi-join on the bin before applying the exact bounds, turning
    O(n*m) into bin-local comparisons (AQE handles residual skew).

Fixture derivation (deterministic, oracle-reproducible):
  * security groups from part (p_partkey%10==0): port range
    [ (p_size%40)*100, (p_size%40)*100+99 ], open to world iff p_partkey%4==0
  * instances from supplier: member of sg-((s_suppkey*10) % n_sgs_base),
    listener port (s_suppkey%40)*100 + 50
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cartography_spark.sources.fixtures import read_table

PORT_BIN = 100


def security_group_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule rows in the exposure pass's shape (single source of truth for the
    formulas is fixtures.ec2_sg_rules — the EC2 module loads the same rows)."""
    from cartography_spark.sources.fixtures import ec2_sg_rules

    return ec2_sg_rules(spark, sf_dir).select("sg_id", "fromport", "toport", "cidr")


def instances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cartography_spark.sources.fixtures import ec2_instances

    return ec2_instances(spark, sf_dir).select(
        "instance_id", "sg_id", "listener_port", "account_id"
    )


def exposed_instances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instances whose security group opens their listener port to the world.

    The range join is bin-bucketed: a rule spanning [from, to] explodes to
    its covered bins; instances join on their port's bin, then the exact
    interval check applies.  Output: instance_id, sg_id, listener_port.
    """
    rules = security_group_rules(spark, sf_dir).where(F.col("cidr") == "0.0.0.0/0")
    inst = instances(spark, sf_dir)

    binned_rules = rules.select(
        "sg_id",
        "fromport",
        "toport",
        F.explode(
            F.sequence(
                (F.col("fromport") / PORT_BIN).cast("long"),
                (F.col("toport") / PORT_BIN).cast("long"),
            )
        ).alias("port_bin"),
    )
    binned_inst = inst.withColumn("port_bin", (F.col("listener_port") / PORT_BIN).cast("long"))

    return (
        binned_inst.join(binned_rules, ["sg_id", "port_bin"], "inner")
        .where(
            (F.col("listener_port") >= F.col("fromport"))
            & (F.col("listener_port") <= F.col("toport"))
        )
        .select("instance_id", "sg_id", "listener_port")
        .distinct()
    )


def mark_exposure(store, spark: SparkSession, sf_dir: str, update_tag: int) -> None:
    """Append 'direct' to exposed instances' exposed_internet_type — the
    list-property accumulation (A4: coalesce(x,[]) + elem) on the graph.

    Rewrites ONLY the EC2Instance label slice (commit_partial): the analysis
    attribute is rebuilt for the whole label each run, so instances no longer
    exposed lose the stale mark — the set-wise analog of the reference job's
    clearing statements (aws_ec2_asset_exposure.json sets the attribute
    fresh per run)."""
    exposed = exposed_instances(spark, sf_dir).select(
        F.col("instance_id").alias("id")
    )
    ec2 = store.nodes(labels=["EC2Instance"])
    marked = ec2.join(F.broadcast(exposed), ["id"], "left_semi").withColumn(
        "props",
        F.map_concat(
            # strip any prior mark first — map_concat EXCEPTIONs on duplicate
            # keys under ANSI policy (re-running analysis on an already-marked
            # node must be idempotent)
            F.map_filter(
                F.coalesce("props", F.create_map()),
                lambda k, _: k != F.lit("exposed_internet_type"),
            ),
            F.create_map(F.lit("exposed_internet_type"), F.lit('["direct"]')),
        ),
    )
    rest = ec2.join(F.broadcast(exposed), ["id"], "left_anti").withColumn(
        "props",
        F.when(
            F.col("props").isNotNull(),
            F.map_filter(F.col("props"), lambda k, _: k != F.lit("exposed_internet_type")),
        ),
    )
    store.commit_partial(
        rest.unionByName(marked),
        None,
        ["EC2Instance"],
        [],
        "analysis:aws_asset_exposure",
        update_tag,
    )
