"""Incremental / streaming ingestion surface.

The reference has NO streaming (SURVEY §2.8): sync is a periodic batch run
versioned by an epoch-seconds update tag, and late/stale data is handled by
tag-mismatch cleanup — not watermarks.  This engine keeps that model:
**one run = one snapshot**, and `incremental_sync` maps a stream of
document batches onto it via `Trigger.AvailableNow`-style foreachBatch, so
a continuously-arriving corpus feeds the same batch semantics.

`stateful_first_seen` is the one genuinely stateful streaming operator we
expose: a streaming dedup that emits each key the first time it appears
(applyInPandasWithState) — the streaming analog of firstseen stamping.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cartography_spark.core.store import GraphStore


def incremental_sync(
    stream_docs: DataFrame,
    store: GraphStore,
    sync_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    base_tag: int,
):
    """Drive snapshot syncs from a streaming source.

    Each micro-batch becomes one update-tag'd sync: ``sync_batch(batch_df,
    base_tag + epoch_id)``.  Exactly-once lands on the store's snapshot
    commit (an aborted batch leaves `_CURRENT` untouched, and stage
    checkpoints skip re-committed (stage, tag) pairs on replay).
    """

    def handle(batch_df: DataFrame, epoch_id: int):
        sync_batch(batch_df, int(base_tag) + int(epoch_id))

    return (
        stream_docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


FIRST_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("first_seen_batch", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def stateful_first_seen(stream: DataFrame, key_col: str) -> DataFrame:
    """Streaming first-seen filter: emit each key exactly once across the
    stream's lifetime (custom stateful operator via applyInPandasWithState).
    """

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            return iter(())
        state.update((True,))
        for pdf in pdfs:
            return iter([pd.DataFrame({"key": [key[0]], "first_seen_batch": [0]})])
        return iter(())

    return (
        stream.select(F.col(key_col).alias("key"))
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            outputStructType=FIRST_SEEN_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize_stateful(stream: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Streaming sessionization as a custom stateful operator.

    Per-user state carries (last event epoch-second, session count, event
    count); each micro-batch folds its rows in (ts, event_id) order and
    emits the user's cumulative totals (update mode), so the LAST emitted
    row per user equals the batch window/lag sessionization — the
    equivalence the events_sessions_stateful driver query asserts against
    the same DuckDB oracle as the batch form.

    Arrow moves each group's rows as pandas frames (vectorized, no per-row
    Python); state is three longs per user, so a 10^9-user keyspace is
    ~24 GB spread across executors — partitioned by the groupBy key like
    any shuffle.  Cross-batch correctness assumes batches arrive in event-
    time order (the standard file-source contract; late data would need the
    watermarked session-window variant instead).
    """

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            last_ts, n_sess, n_ev = state.get
        else:
            last_ts, n_sess, n_ev = None, 0, 0
        frames = [pdf for pdf in pdfs]
        rows = pd.concat(frames).sort_values(["ts", "event_id"])
        # whole-second epochs to match the batch form's unix_timestamp()
        secs = (rows["ts"].astype("int64") // 1_000_000_000).to_numpy()
        for ts in secs:
            if last_ts is None or ts - last_ts > gap_s:
                n_sess += 1
            last_ts = int(ts)
            n_ev += 1
        state.update((last_ts, n_sess, n_ev))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sess], "n_events": [n_ev]}
        )

    return (
        stream.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
