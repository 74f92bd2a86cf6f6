"""Incremental (streaming-driven) sync + stateful first-seen operator."""

import shutil

from pyspark.sql import functions as F

from cartography_spark.core.loader import compile_nodes
from cartography_spark.modules.aws_emr import EMR_CLUSTER_SCHEMA
from cartography_spark.streaming.incremental import incremental_sync, stateful_first_seen
from tests.conftest import SF_DIR


def test_incremental_sync_foreachbatch(spark, store, tmp_path):
    """A stream of cluster batches drives tag-versioned snapshot syncs."""
    src = tmp_path / "in"
    src.mkdir()
    batch = spark.createDataFrame(
        [("j-1", "arn:aws:elasticmapreduce:us-east-1:000000000000:cluster/j-1", "c1",
          "EMR_DefaultRole", True, "emr-6.10.0", "000000000000", "us-east-1")],
        ["Id", "ClusterArn", "Name", "ServiceRole", "TerminationProtected",
         "ReleaseLabel", "account_id", "region"],
    )
    batch.write.parquet(str(src / "b0"))

    stream = spark.readStream.schema(batch.schema).parquet(str(src) + "/*")

    def sync_batch(df, tag):
        store.upsert(compile_nodes(df, EMR_CLUSTER_SCHEMA, tag), None, f"emr:{tag}", tag)

    q = incremental_sync(stream, store, sync_batch, str(tmp_path / "ckpt"), 500_000_000)
    q.awaitTermination(120)

    nodes = store.nodes().where(F.col("label") == "EMRCluster").collect()
    assert len(nodes) == 1
    assert nodes[0].lastupdated >= 500_000_000


def test_stateful_first_seen(spark, tmp_path):
    """Keys emit exactly once across micro-batches (custom stateful op)."""
    src = tmp_path / "keys"
    src.mkdir()
    spark.createDataFrame([("a",), ("b",), ("a",)], ["k"]).write.parquet(str(src / "b0"))

    stream = spark.readStream.schema("k string").parquet(str(src) + "/*")
    out = stateful_first_seen(stream, "k")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("first_seen_out")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.key for r in spark.sql("SELECT * FROM first_seen_out").collect()}
    assert rows == {"a", "b"}
