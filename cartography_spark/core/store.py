"""GraphStore — snapshot-versioned node/edge triple tables with MERGE semantics.

Production target is Iceberg (``MERGE INTO nodes USING batch ON t.id = b.id
AND t.label = b.label WHEN MATCHED THEN UPDATE ... WHEN NOT MATCHED THEN
INSERT ...``), with tables partitioned by label and Z-ordered on id.  The
sandbox image has no Iceberg runtime jar, so this module implements the same
contract on plain parquet with atomic snapshot directories:

    {root}/nodes/v{N}/...parquet        immutable snapshot N of the node table
    {root}/edges/v{N}/...parquet
    {root}/_meta/v{N}.json              lineage + per-stage metrics for N
    {root}/_CURRENT                     text file holding the live version

A commit writes both tables and the meta sidecar, then atomically swings
``_CURRENT`` — a crash mid-commit leaves the previous snapshot live, which is
exactly Iceberg's snapshot-isolation behavior.  Stage checkpoints
(``stage_done``/``mark_stage``) make any pipeline stage idempotently
resumable: re-running a killed sync skips stages whose (stage, update_tag)
checkpoint already committed (north_rule resumability).

Parity notes vs the reference:
  * upsert == Neo4j MERGE by id with ``ON CREATE SET firstseen``
    (reference: cartography/graph/querybuilder.py:372-401); here a set-wise
    left join preserves the matched rows' firstseen.
  * index creation (reference: cartography/graph/querybuilder.py:404-453,
    data/indexes.cypher) is a deliberate no-op on columnar storage: the
    equivalents are partition-by-label + ``repartition`` on id before write
    so same-key rows co-locate, and min/max parquet stats give the pruning
    an index would.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cartography_spark.core.loader import EDGES_SCHEMA, NODES_SCHEMA

EDGE_KEY = ["src_id", "rel_label", "dst_id"]


class GraphStore:
    """Versioned (nodes, edges) pair with MERGE upsert / anti-join delete."""

    def __init__(self, spark: SparkSession, root: str, write_partitions: int | None = None):
        self.spark = spark
        self.root = root
        # Sized for the sandbox; at 100 TB this is labels x (table_bytes /
        # maxPartitionBytes) and would come from cluster config.
        self.write_partitions = write_partitions or max(
            4, int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 4
        )
        os.makedirs(os.path.join(root, "_meta"), exist_ok=True)

    # ----- snapshot plumbing ------------------------------------------------

    def _current_version(self) -> int:
        p = os.path.join(self.root, "_CURRENT")
        if not os.path.exists(p):
            return 0
        with open(p) as f:
            return int(f.read().strip())

    def current_meta(self) -> dict:
        v = self._current_version()
        p = os.path.join(self.root, "_meta", f"v{v}.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def _read(self, sub: str, schema, version: int | None = None) -> DataFrame:
        v = self._current_version() if version is None else version
        if v == 0:
            return self.spark.createDataFrame([], schema)
        # Explicit schema: an empty partitioned write leaves no data files to
        # infer from, and it also pins column order (partition cols otherwise
        # come back last).
        df = self.spark.read.schema(schema).parquet(os.path.join(self.root, sub, f"v{v}"))
        return df.select(*[f.name for f in schema.fields])

    def nodes(self, version: int | None = None) -> DataFrame:
        return self._read("nodes", NODES_SCHEMA, version)

    def edges(self, version: int | None = None) -> DataFrame:
        return self._read("edges", EDGES_SCHEMA, version)

    def commit(
        self,
        nodes: DataFrame,
        edges: DataFrame,
        stage: str,
        update_tag: int,
        metrics: Mapping[str, object] | None = None,
    ) -> int:
        """Write a new immutable snapshot and atomically publish it.

        Lineage + metrics land in the meta sidecar next to the commit
        (north_rule: per-partition lineage and metrics beside each
        checkpoint).  Row counts come from ``observe`` — a single pass, no
        extra action.
        """
        prev = self._current_version()
        v = prev + 1

        # Co-locate by (label, id) so downstream joins and next-run upserts
        # read clustered data; partitionBy(label) gives partition pruning.
        (
            nodes.repartition(self.write_partitions, "label", "id")
            .sortWithinPartitions("label", "id")
            .write.mode("overwrite")
            .partitionBy("label")
            .parquet(os.path.join(self.root, "nodes", f"v{v}"))
        )
        (
            edges.repartition(self.write_partitions, "rel_label", "src_id")
            .sortWithinPartitions("rel_label", "src_id")
            .write.mode("overwrite")
            .partitionBy("rel_label")
            .parquet(os.path.join(self.root, "edges", f"v{v}"))
        )

        # Row counts come from the freshly written parquet footers — a
        # metadata-only job, no second pass over the data.
        node_rows = self._read("nodes", NODES_SCHEMA, v).count()
        edge_rows = self._read("edges", EDGES_SCHEMA, v).count()

        prev_meta = self.current_meta()
        stages = dict(prev_meta.get("stages", {}))
        stages[stage] = {"update_tag": int(update_tag), "version": v}
        meta = {
            "version": v,
            "parent": prev,
            "stage": stage,
            "update_tag": int(update_tag),
            "committed_at": time.time(),
            "metrics": {
                "node_rows": node_rows,
                "edge_rows": edge_rows,
                **(dict(metrics) if metrics else {}),
            },
            "stages": stages,
        }
        tmp = os.path.join(self.root, "_meta", f"v{v}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2)
        os.replace(tmp, os.path.join(self.root, "_meta", f"v{v}.json"))

        cur_tmp = os.path.join(self.root, "_CURRENT.tmp")
        with open(cur_tmp, "w") as f:
            f.write(str(v))
        os.replace(cur_tmp, os.path.join(self.root, "_CURRENT"))

        # Retire snapshots older than the parent (keep parent for time-travel
        # / drift diffing; a production catalog would expire by age).
        for old in range(1, prev):
            for sub in ("nodes", "edges"):
                p = os.path.join(self.root, sub, f"v{old}")
                if os.path.exists(p):
                    shutil.rmtree(p, ignore_errors=True)
        return v

    # ----- resumable stage checkpoints --------------------------------------

    def stage_done(self, stage: str, update_tag: int) -> bool:
        s = self.current_meta().get("stages", {}).get(stage)
        return bool(s and s.get("update_tag") == int(update_tag))

    # ----- MERGE semantics ---------------------------------------------------

    def upsert(
        self,
        new_nodes: DataFrame | None,
        new_edges: DataFrame | None,
        stage: str,
        update_tag: int,
        metrics: Mapping[str, object] | None = None,
    ) -> int:
        """MERGE a batch into the live snapshot and commit.

        firstseen discipline (reference querybuilder.py:376, ``ON CREATE SET
        i.firstseen = timestamp()``): matched rows keep their existing
        firstseen; new rows get the update tag.  Implemented as one left
        join per table — no collect, no per-row work.
        """
        nodes, edges = self.nodes(), self.edges()

        # Each batch feeds two joins (merge + anti); cache so the upstream
        # plan (often a full module pipeline) computes once.
        cached = []
        if new_nodes is not None:
            new_nodes = new_nodes.cache()
            cached.append(new_nodes)
        if new_edges is not None:
            new_edges = new_edges.cache()
            cached.append(new_edges)

        if new_nodes is not None:
            old_keys = nodes.select(
                F.col("label").alias("_l"), F.col("id").alias("_i"), F.col("firstseen").alias("_fs")
            )
            merged_new = (
                new_nodes.join(
                    old_keys,
                    (new_nodes["label"] == old_keys["_l"]) & (new_nodes["id"] == old_keys["_i"]),
                    "left",
                )
                .withColumn(
                    "firstseen", F.coalesce(F.col("_fs"), F.lit(int(update_tag)))
                )
                .drop("_l", "_i", "_fs")
                .select(*[f.name for f in NODES_SCHEMA.fields])
            )
            untouched = nodes.join(
                new_nodes.select("label", "id"), ["label", "id"], "left_anti"
            )
            nodes = untouched.unionByName(merged_new)

        if new_edges is not None:
            old_e = edges.select(
                *[F.col(k).alias(f"_{k}") for k in EDGE_KEY], F.col("firstseen").alias("_fs")
            )
            cond = (
                (new_edges["src_id"] == old_e["_src_id"])
                & (new_edges["rel_label"] == old_e["_rel_label"])
                & (new_edges["dst_id"] == old_e["_dst_id"])
            )
            merged_new_e = (
                new_edges.join(old_e, cond, "left")
                .withColumn("firstseen", F.coalesce(F.col("_fs"), F.lit(int(update_tag))))
                .drop("_src_id", "_rel_label", "_dst_id", "_fs")
                .select(*[f.name for f in EDGES_SCHEMA.fields])
            )
            untouched_e = edges.join(new_edges.select(*EDGE_KEY), EDGE_KEY, "left_anti")
            edges = untouched_e.unionByName(merged_new_e)

        try:
            return self.commit(nodes, edges, stage, update_tag, metrics)
        finally:
            for df in cached:
                df.unpersist()

    def delete(
        self,
        stale_nodes: DataFrame | None,
        stale_edges: DataFrame | None,
        stage: str,
        update_tag: int,
    ) -> int:
        """Set-based delete: anti-join out stale rows, DETACH-cascading edges.

        The reference deletes in LIMIT-batched loops purely for transaction
        sizing (graph/statement.py:112-128); a snapshot commit needs no
        batching.  DETACH semantics: deleting a node also removes every
        incident edge — done in the same commit so no snapshot ever holds a
        dangling edge.
        """
        nodes, edges = self.nodes(), self.edges()

        if stale_nodes is not None:
            sn = stale_nodes.select("label", "id").distinct()
            nodes = nodes.join(sn, ["label", "id"], "left_anti")
            sid = sn.select("id").distinct()
            edges = edges.join(sid.withColumnRenamed("id", "src_id"), ["src_id"], "left_anti")
            edges = edges.join(sid.withColumnRenamed("id", "dst_id"), ["dst_id"], "left_anti")

        if stale_edges is not None:
            edges = edges.join(stale_edges.select(*EDGE_KEY).distinct(), EDGE_KEY, "left_anti")

        return self.commit(nodes, edges, stage, update_tag)
