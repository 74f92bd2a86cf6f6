"""Structured Streaming coverage.

The reference has no streaming (sync is tag-versioned batch — SURVEY §2.8);
our incremental model is batch snapshots.  This module proves the windowed
aggregation used in `events_windowed_counts` produces identical results when
driven through readStream (Trigger.AvailableNow-style), i.e. the engine's
operators are streaming-compatible where the semantics allow.
"""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    schema = batch.schema

    # FileStreamSource requires a directory
    import shutil

    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", stream_dir / "part-0.parquet")

    stream = spark.readStream.schema(schema).parquet(str(stream_dir))
    # parquet stores TIMESTAMP_NTZ; watermarks require TIMESTAMP (session-TZ
    # is pinned to UTC so the cast is value-preserving)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.unix_timestamp("window.start").alias("hour_epoch"),
            "event_type",
            "n",
            "total_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.hour_epoch, r.event_type, r.n, round(r.total_value, 6))
        for r in spark.sql("SELECT * FROM stream_out").collect()
    }
    expected = {
        (r.hour_epoch, r.event_type, r.n, round(r.total_value, 6))
        for r in batch.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .collect()
    }
    assert got == expected


def test_stateful_sessionization_matches_batch(spark, tmp_path):
    """The applyInPandasWithState sessionizer's final per-user rows equal
    the batch window/lag sessionization at sf0.001."""
    import uuid

    import __spark_entry__ as entry
    from cartography_spark.sources.fixtures import read_table
    from cartography_spark.streaming.incremental import sessionize_stateful

    schema = read_table(spark, SF_DIR, "events").schema
    name = "t_sess_" + uuid.uuid4().hex[:8]
    q = (
        sessionize_stateful(
            spark.readStream.schema(schema).parquet(f"{SF_DIR}/events.parque[t]")
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import Window

    t = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    got = {
        (r.user_id, r.n_sessions, r.n_events)
        for r in t.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
        .collect()
    }
    want = {
        (r.user_id, r.n_sessions, r.n_events)
        for r in entry._q_events_sessions(spark, SF_DIR).collect()
    }
    assert got == want and got
