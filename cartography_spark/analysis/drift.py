"""Drift detection — set-difference between two states of the same query.

Parity: reference driftdetect/detect_deviations.py:66-112 — compare_states
reports rows that appeared (new) and rows that vanished (missing) between
two archived result sets of one saved query.  Multi-value fields are
pipe-joined strings split on "|" (:105-109).

Spark restatement: ``exceptAll`` in both directions with a direction tag.
State archival itself is the store's snapshot versioning (time travel =
read an older version), so a drift "state" is just (query, version).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_drift(start: DataFrame, end: DataFrame) -> DataFrame:
    """Rows added/removed between two result sets.

    Output: all columns of the inputs + ``direction`` ('new' | 'missing').
    Duplicate-aware (exceptAll, like the reference's list-based compare).
    """
    new = end.exceptAll(start).withColumn("direction", F.lit("new"))
    missing = start.exceptAll(end).withColumn("direction", F.lit("missing"))
    return new.unionByName(missing)


def split_multi_value(df: DataFrame, col: str) -> DataFrame:
    """Pipe-delimited multi-value expansion (detect_deviations.py:105-109)."""
    return df.withColumn(col, F.split(F.col(col), r"\|"))


def save_state(df: DataFrame, state_dir: str, name: str, tag: int) -> str:
    """Archive a query's result as a drift state (reference:
    driftdetect/get_states.py + storage.py — JSON files per run).  States are
    parquet here (columnar, schema'd); path encodes (detector name, tag)."""
    path = f"{state_dir}/{name}/tag={tag}"
    df.write.mode("overwrite").parquet(path)
    return path


def load_state(spark, state_dir: str, name: str, tag: int) -> DataFrame:
    return spark.read.parquet(f"{state_dir}/{name}/tag={tag}")


def drift_between_states(spark, state_dir: str, name: str, tag_a: int, tag_b: int) -> DataFrame:
    """compare_states analog: diff two archived states of one detector."""
    return detect_drift(
        load_state(spark, state_dir, name, tag_a),
        load_state(spark, state_dir, name, tag_b),
    )
