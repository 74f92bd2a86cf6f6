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
