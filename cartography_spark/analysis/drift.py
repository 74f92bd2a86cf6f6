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


class DriftArchive:
    """Multi-state drift archive — the reference's drift-detection directory
    lifecycle (driftdetect/cli.py, get_states.py, storage.py): a root
    directory holds one subdirectory per *detector*; each run archives a new
    state under the run's update tag; reports diff two archived states
    (defaulting to the two most recent, like `cartography-detectdrift
    get-drift` with no explicit states); shortcuts alias human names to
    state tags (reference add-shortcut maps alias -> state filename).

    States are parquet (columnar, schema'd) instead of the reference's JSON
    row lists; everything else follows the same add-state -> report cycle.
    """

    def __init__(self, spark, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    # -- add-state (get_states.run_get_states analog) -----------------------

    def get_state(self, detectors: dict[str, DataFrame], tag: int) -> dict[str, str]:
        """Archive the current result of every detector query under ``tag``.
        ``detectors`` maps detector name -> its result DataFrame (the
        reference runs each detector directory's validation_query; callers
        here pass the equivalent DataFrame queries over the graph store)."""
        return {
            name: save_state(df, self.root, name, tag)
            for name, df in detectors.items()
        }

    # -- state enumeration (storage.FileSystem.walk analog) ------------------

    def states(self, name: str) -> list[int]:
        """Archived tags for one detector, ascending."""
        import os
        import re

        d = f"{self.root}/{name}"
        if not os.path.isdir(d):
            return []
        tags = []
        for entry in os.listdir(d):
            m = re.fullmatch(r"tag=(\d+)", entry)
            if m:
                tags.append(int(m.group(1)))
        return sorted(tags)

    def detectors(self) -> list[str]:
        import os

        if not os.path.isdir(self.root):
            return []
        return sorted(
            e for e in os.listdir(self.root)
            if os.path.isdir(f"{self.root}/{e}") and not e.startswith("_")
        )

    # -- shortcuts (cli add-shortcut analog) ---------------------------------

    def add_shortcut(self, name: str, alias: str, tag: int) -> None:
        import json
        import os

        if tag not in self.states(name):
            raise ValueError(f"detector {name} has no archived state tag={tag}")
        path = f"{self.root}/{name}/_shortcuts.json"
        cur = {}
        if os.path.exists(path):
            with open(path) as f:
                cur = json.load(f)
        cur[alias] = tag
        with open(path, "w") as f:
            json.dump(cur, f)

    def resolve(self, name: str, state) -> int:
        """A state reference is a tag int or a shortcut alias."""
        if isinstance(state, int):
            return state
        import json
        import os

        path = f"{self.root}/{name}/_shortcuts.json"
        if os.path.exists(path):
            with open(path) as f:
                shortcuts = json.load(f)
            if state in shortcuts:
                return int(shortcuts[state])
        raise KeyError(f"unknown drift state '{state}' for detector {name}")

    # -- report (cli get-drift / report_drift analog) ------------------------

    def report(self, name: str, start=None, end=None) -> DataFrame:
        """Drift between two archived states; each unnamed endpoint defaults
        independently (start -> second-most-recent, end -> most recent), so a
        caller-supplied single endpoint is honored rather than overwritten."""
        tags = self.states(name)
        if start is None:
            if len(tags) < 2:
                raise ValueError(f"detector {name} needs >=2 archived states")
            start = tags[-2]
        if end is None:
            if not tags:
                raise ValueError(f"detector {name} has no archived states")
            end = tags[-1]
        return drift_between_states(
            self.spark, self.root, name,
            self.resolve(name, start), self.resolve(name, end),
        )
