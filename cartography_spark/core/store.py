"""GraphStore — manifest-versioned node/edge triple tables with MERGE semantics.

Production target is Iceberg (``MERGE INTO nodes USING batch ON t.id = b.id
AND t.label = b.label WHEN MATCHED THEN UPDATE ... WHEN NOT MATCHED THEN
INSERT ...``), with tables partitioned by label and Z-ordered on id.  The
sandbox image has no Iceberg runtime jar, so this module implements the same
contract on plain parquet with a *per-label manifest* — the same idea as an
Iceberg snapshot's manifest list, specialized to label-partitioned tables:

    {root}/data/g{N}/nodes/_label=<label>/*.parquet   label slices written at commit N
    {root}/data/g{N}/edges/_label=<rel_label>/*.parquet
    {root}/_meta/v{N}.json    manifest: label -> {path, rows} + lineage + metrics
    {root}/_CURRENT           text file holding the live version

A commit writes ONLY the labels its batch touched into a new generation
directory, then publishes a manifest that points at the new slices for
touched labels and carries the parent's pointers forward for everything
else — O(|touched labels|) I/O per commit, not O(|graph|).  ``_CURRENT``
swings atomically; a crash mid-commit leaves the previous snapshot live
(Iceberg snapshot-isolation behavior) and the next commit garbage-collects
the unpublished generation.  Stage checkpoints (``stage_done``) make any
pipeline stage idempotently resumable: re-running a killed sync skips
stages whose (stage, update_tag) checkpoint already committed
(north_rule resumability).

Parity notes vs the reference:
  * upsert == Neo4j MERGE by id with ``ON CREATE SET firstseen``
    (reference: cartography/graph/querybuilder.py:372-401); here a set-wise
    left join preserves the matched rows' firstseen.  SET writes only the
    batch's declared properties (querybuilder.py:96-109 builds SET from the
    schema's props): matched rows keep property keys the new batch does not
    mention (per-key map merge), so multiple modules can enrich one node.
  * index creation (reference: cartography/graph/querybuilder.py:404-453,
    data/indexes.cypher) is a deliberate no-op on columnar storage: the
    equivalents are the per-label slice layout (partition pruning by label)
    + ``repartition`` on id before write so same-key rows co-locate, and
    min/max parquet stats give the pruning an index would.
  * Single writer per store root is assumed (the reference likewise runs
    one sync process per Neo4j database).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Iterable, Mapping
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cartography_spark.core.loader import EDGES_SCHEMA, NODES_SCHEMA

EDGE_KEY = ["src_id", "rel_label", "dst_id"]


def _merge_props(old_col, new_col):
    """Per-key property merge: new batch's keys win; keys the batch does not
    mention survive from the stored row (reference MERGE SET semantics —
    querybuilder.py:96-109 only SETs the schema-declared properties)."""
    old = F.coalesce(old_col, F.create_map().cast("map<string,string>"))
    new = F.coalesce(new_col, F.create_map().cast("map<string,string>"))
    kept = F.map_filter(old, lambda k, _: ~F.array_contains(F.map_keys(new), k))
    merged = F.map_concat(kept, new)
    return F.when(F.size(merged) > 0, merged).otherwise(F.lit(None))


class GraphStore:
    """Versioned (nodes, edges) pair with MERGE upsert / anti-join delete.

    Commits are incremental per label: each generation directory holds full
    replacement slices for the labels the commit touched; the manifest maps
    every live label to its current slice.
    """

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
        return self._manifest(self._current_version())

    def _manifest(self, version: int) -> dict:
        if version <= 0:
            return {}
        p = os.path.join(self.root, "_meta", f"v{version}.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def _read(
        self,
        sub: str,
        schema,
        version: int | None = None,
        labels: Iterable[str] | None = None,
    ) -> DataFrame:
        man = self._manifest(self._current_version() if version is None else version)
        entries = man.get(sub, {})
        if labels is not None:
            wanted = set(labels)
            entries = {k: v for k, v in entries.items() if k in wanted}
        paths = [os.path.join(self.root, e["path"]) for e in entries.values()]
        if not paths:
            return self.spark.createDataFrame([], schema)
        # Explicit schema pins column order; the label column is stored in the
        # data files (the _label partition dir is a routing duplicate), so a
        # direct leaf-dir read needs no partition discovery.
        df = self.spark.read.schema(schema).parquet(*paths)
        return df.select(*[f.name for f in schema.fields])

    def nodes(self, version: int | None = None, labels: Iterable[str] | None = None) -> DataFrame:
        """Node table; pass ``labels`` to physically prune to those slices."""
        return self._read("nodes", NODES_SCHEMA, version, labels)

    def edges(
        self, version: int | None = None, rel_labels: Iterable[str] | None = None
    ) -> DataFrame:
        """Edge table; pass ``rel_labels`` to physically prune to those slices."""
        return self._read("edges", EDGES_SCHEMA, version, rel_labels)

    # ----- write path ---------------------------------------------------------

    def _write_slices(self, df: DataFrame, sub: str, version: int, part_col: str) -> dict:
        """Write df into data/g{version}/{sub}/_label=<v>/ slices.

        Returns {label: {"path": relpath, "rows": n}}.  Row counts come from
        a partition-column-only scan of the fresh files (footer metadata —
        no data pages read).
        """
        gen_rel = os.path.join("data", f"g{version}", sub)
        gen_abs = os.path.join(self.root, gen_rel)
        (
            df.withColumn("_label", F.col(part_col))
            .repartition(self.write_partitions, part_col, df.columns[0])
            .sortWithinPartitions(part_col)
            .write.mode("overwrite")
            .partitionBy("_label")
            .parquet(gen_abs)
        )
        out: dict[str, dict] = {}
        if not any(d.startswith("_label=") for d in os.listdir(gen_abs)):
            return out  # empty frame -> no slices
        counts = (
            self.spark.read.parquet(gen_abs)
            .groupBy("_label")
            .count()
            .collect()
        )
        for r in counts:
            d = f"_label={r['_label']}"
            # dir name on disk is partition-escaped; find it by unquoting
            actual = next(
                (x for x in os.listdir(gen_abs) if x.startswith("_label=") and unquote(x[7:]) == str(r["_label"])),
                d,
            )
            out[str(r["_label"])] = {
                "path": os.path.join(gen_rel, actual),
                "rows": int(r["count"]),
            }
        return out

    def _publish(
        self,
        node_slices: dict | None,
        edge_slices: dict | None,
        touched_node_labels: Iterable[str] | None,
        touched_rel_labels: Iterable[str] | None,
        version: int,
        stage: str,
        update_tag: int,
        metrics: Mapping[str, object] | None,
    ) -> int:
        """Assemble + atomically publish manifest v{version}.

        ``touched_*`` of None means full replace for that table (the new
        slices are the whole table); otherwise parent pointers carry forward
        for untouched labels and touched labels absent from the new slices
        (fully deleted) drop out.
        """
        prev = self._current_version()
        parent = self._manifest(prev)

        def _assemble(new_slices, touched, table):
            if touched is None:
                return dict(new_slices or {})
            out = {
                k: v
                for k, v in parent.get(table, {}).items()
                if k not in set(touched)
            }
            out.update(new_slices or {})
            return out

        nodes_man = _assemble(node_slices, touched_node_labels, "nodes")
        edges_man = _assemble(edge_slices, touched_rel_labels, "edges")

        stages = dict(parent.get("stages", {}))
        stages[stage] = {
            "update_tag": int(update_tag),
            "version": version,
            "labels": sorted((node_slices or {}).keys()),
            "rels": sorted((edge_slices or {}).keys()),
        }
        meta = {
            "version": version,
            "parent": prev,
            "stage": stage,
            "update_tag": int(update_tag),
            "committed_at": time.time(),
            "nodes": nodes_man,
            "edges": edges_man,
            "metrics": {
                "node_rows": sum(e["rows"] for e in nodes_man.values()),
                "edge_rows": sum(e["rows"] for e in edges_man.values()),
                "labels_written": len(node_slices or {}),
                "rels_written": len(edge_slices or {}),
                **(dict(metrics) if metrics else {}),
            },
            "stages": stages,
        }
        tmp = os.path.join(self.root, "_meta", f"v{version}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2)
        os.replace(tmp, os.path.join(self.root, "_meta", f"v{version}.json"))

        cur_tmp = os.path.join(self.root, "_CURRENT.tmp")
        with open(cur_tmp, "w") as f:
            f.write(str(version))
        os.replace(cur_tmp, os.path.join(self.root, "_CURRENT"))

        self._gc(keep=(version, prev))
        return version

    def _gc(self, keep: tuple[int, int]) -> None:
        """Remove label slices no manifest in ``keep`` references (the parent
        stays live for time-travel/drift diffing, as an Iceberg catalog would
        until snapshot expiry)."""
        referenced = set()
        for v in keep:
            man = self._manifest(v)
            for table in ("nodes", "edges"):
                for e in man.get(table, {}).values():
                    referenced.add(os.path.normpath(e["path"]))
        data = os.path.join(self.root, "data")
        if not os.path.isdir(data):
            return
        for gen in os.listdir(data):
            gen_dir = os.path.join(data, gen)
            live = False
            for sub in ("nodes", "edges"):
                sub_dir = os.path.join(gen_dir, sub)
                if not os.path.isdir(sub_dir):
                    continue
                for leaf in os.listdir(sub_dir):
                    if not leaf.startswith("_label="):
                        continue
                    rel = os.path.normpath(os.path.join("data", gen, sub, leaf))
                    if rel in referenced:
                        live = True
                    else:
                        shutil.rmtree(os.path.join(sub_dir, leaf), ignore_errors=True)
            if not live:
                shutil.rmtree(gen_dir, ignore_errors=True)

    def _next_version(self) -> int:
        v = self._current_version() + 1
        # a crash after writing g{v} but before publish leaves garbage; reclaim
        gen = os.path.join(self.root, "data", f"g{v}")
        if os.path.exists(gen):
            shutil.rmtree(gen, ignore_errors=True)
        return v

    def commit(
        self,
        nodes: DataFrame,
        edges: DataFrame,
        stage: str,
        update_tag: int,
        metrics: Mapping[str, object] | None = None,
    ) -> int:
        """Full-replace commit: the given frames become the whole graph.

        Used by the bulk builder and full-snapshot passes; incremental
        callers use :meth:`commit_partial` / :meth:`upsert` / :meth:`delete`.
        """
        v = self._next_version()
        node_slices = self._write_slices(nodes, "nodes", v, "label")
        edge_slices = self._write_slices(edges, "edges", v, "rel_label")
        return self._publish(
            node_slices, edge_slices, None, None, v, stage, update_tag, metrics
        )

    def commit_partial(
        self,
        nodes: DataFrame | None,
        edges: DataFrame | None,
        touched_node_labels: Iterable[str],
        touched_rel_labels: Iterable[str],
        stage: str,
        update_tag: int,
        metrics: Mapping[str, object] | None = None,
    ) -> int:
        """Replace only the given labels' slices; everything else carries
        forward by manifest pointer (the Iceberg-MERGE cost model: I/O is
        O(touched partitions), not O(table))."""
        v = self._next_version()
        node_slices = self._write_slices(nodes, "nodes", v, "label") if nodes is not None else {}
        edge_slices = (
            self._write_slices(edges, "edges", v, "rel_label") if edges is not None else {}
        )
        return self._publish(
            node_slices,
            edge_slices,
            touched_node_labels,
            touched_rel_labels,
            v,
            stage,
            update_tag,
            metrics,
        )

    # ----- resumable stage checkpoints --------------------------------------

    def stage_done(self, stage: str, update_tag: int) -> bool:
        s = self.current_meta().get("stages", {}).get(stage)
        return bool(s and s.get("update_tag") == int(update_tag))

    def stages_for_tag(self, update_tag: int) -> dict[str, dict]:
        """Stage checkpoints recorded under this tag (labels/rels each stage
        wrote) — the cleanup scoper's source of truth."""
        return {
            k: v
            for k, v in self.current_meta().get("stages", {}).items()
            if v.get("update_tag") == int(update_tag)
        }

    # ----- MERGE semantics ---------------------------------------------------

    def _stage_batch(self, df: DataFrame, sub: str, schema) -> DataFrame:
        """Materialize the incoming batch to a staging dir and read it back.

        This is the Iceberg write-path shape — batch data files land first,
        the MERGE works from files.  It truncates the batch's (possibly
        enormous) upstream logical plan: the merge joins, the distinct-labels
        probe, and the final slice write all re-analyze a leaf parquet scan
        instead of the whole module pipeline, which on a driver-latency-bound
        host is the difference between O(plan) and O(1) per downstream
        action.  Staging files are reclaimed by _gc after publish.
        """
        path = os.path.join(self.root, "data", "_staging", sub)
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.schema(schema).parquet(path)

    def upsert(
        self,
        new_nodes: DataFrame | None,
        new_edges: DataFrame | None,
        stage: str,
        update_tag: int,
        metrics: Mapping[str, object] | None = None,
    ) -> int:
        """MERGE a batch into the live snapshot; rewrites only touched labels.

        firstseen discipline (reference querybuilder.py:376, ``ON CREATE SET
        i.firstseen = timestamp()``): matched rows keep their existing
        firstseen; new rows get the update tag.  Matched rows' props merge
        per-key (new keys win, unmentioned keys survive — MERGE SET parity).
        Implemented as one left join per table over ONLY the touched label
        slices — no collect of data, no per-row work.
        """
        if self._current_version() == 0:
            # MERGE into an empty table is INSERT ALL: no old rows to match,
            # so skip the staging write, the distinct-labels probes, and the
            # merge joins entirely — one pass: execute the batch plan straight
            # into the generation slices (touched labels fall out of the
            # written partition dirs).  Halves the write I/O of a cold bulk
            # load; identical rows to the merge path (firstseen resolves to
            # coalesce(NULL, tag) = tag for every row).
            v = self._next_version()
            node_slices = edge_slices = {}
            fs = F.coalesce(F.col("firstseen"), F.lit(int(update_tag)))
            if new_nodes is not None:
                nn = new_nodes.withColumn("firstseen", fs).select(
                    *[f.name for f in NODES_SCHEMA.fields]
                )
                node_slices = self._write_slices(nn, "nodes", v, "label")
            if new_edges is not None:
                ne = new_edges.withColumn("firstseen", fs).select(
                    *[f.name for f in EDGES_SCHEMA.fields]
                )
                edge_slices = self._write_slices(ne, "edges", v, "rel_label")
            return self._publish(
                node_slices,
                edge_slices,
                sorted(node_slices),
                sorted(edge_slices),
                v,
                stage,
                update_tag,
                metrics,
            )

        touched_labels: list[str] = []
        touched_rels: list[str] = []
        nodes_out = edges_out = None

        if new_nodes is not None:
            new_nodes = self._stage_batch(new_nodes, "nodes", NODES_SCHEMA)
            touched_labels = [r[0] for r in new_nodes.select("label").distinct().collect()]
            old = self.nodes(labels=touched_labels)
            old_keys = old.select(
                F.col("label").alias("_l"),
                F.col("id").alias("_i"),
                F.col("firstseen").alias("_fs"),
                F.col("props").alias("_op"),
            )
            merged_new = (
                new_nodes.join(
                    old_keys,
                    (new_nodes["label"] == old_keys["_l"]) & (new_nodes["id"] == old_keys["_i"]),
                    "left",
                )
                .withColumn("firstseen", F.coalesce(F.col("_fs"), F.lit(int(update_tag))))
                .withColumn("props", _merge_props(F.col("_op"), new_nodes["props"]))
                .drop("_l", "_i", "_fs", "_op")
                .select(*[f.name for f in NODES_SCHEMA.fields])
            )
            untouched = old.join(
                new_nodes.select("label", "id"), ["label", "id"], "left_anti"
            )
            nodes_out = untouched.unionByName(merged_new)

        if new_edges is not None:
            new_edges = self._stage_batch(new_edges, "edges", EDGES_SCHEMA)
            touched_rels = [r[0] for r in new_edges.select("rel_label").distinct().collect()]
            old_edges = self.edges(rel_labels=touched_rels)
            old_e = old_edges.select(
                *[F.col(k).alias(f"_{k}") for k in EDGE_KEY],
                F.col("firstseen").alias("_fs"),
                F.col("props").alias("_op"),
            )
            cond = (
                (new_edges["src_id"] == old_e["_src_id"])
                & (new_edges["rel_label"] == old_e["_rel_label"])
                & (new_edges["dst_id"] == old_e["_dst_id"])
            )
            merged_new_e = (
                new_edges.join(old_e, cond, "left")
                .withColumn("firstseen", F.coalesce(F.col("_fs"), F.lit(int(update_tag))))
                .withColumn("props", _merge_props(F.col("_op"), new_edges["props"]))
                .drop("_src_id", "_rel_label", "_dst_id", "_fs", "_op")
                .select(*[f.name for f in EDGES_SCHEMA.fields])
            )
            untouched_e = old_edges.join(new_edges.select(*EDGE_KEY), EDGE_KEY, "left_anti")
            edges_out = untouched_e.unionByName(merged_new_e)

        return self.commit_partial(
            nodes_out, edges_out, touched_labels, touched_rels, stage, update_tag, metrics
        )

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
        dangling edge.  Only labels that actually lose rows are rewritten;
        finding which rel slices hold incident edges costs one column-pruned
        scan (src_id, dst_id, rel_label) — reads, never writes, the
        untouched slices.
        """
        touched_labels: list[str] = []
        touched_rels: set[str] = set()
        nodes_out = edges_out = None
        cached = []

        sid = None
        if stale_nodes is not None:
            sn = stale_nodes.select("label", "id").distinct().cache()
            cached.append(sn)
            touched_labels = [r[0] for r in sn.select("label").distinct().collect()]
            nodes_out = self.nodes(labels=touched_labels).join(
                sn, ["label", "id"], "left_anti"
            )
            sid = sn.select("id").distinct().cache()
            cached.append(sid)
            incident = (
                self.edges()
                .select("src_id", "dst_id", "rel_label")
                .join(F.broadcast(sid.withColumnRenamed("id", "src_id")), ["src_id"], "left_semi")
                .select("rel_label")
                .unionByName(
                    self.edges()
                    .select("src_id", "dst_id", "rel_label")
                    .join(
                        F.broadcast(sid.withColumnRenamed("id", "dst_id")),
                        ["dst_id"],
                        "left_semi",
                    )
                    .select("rel_label")
                )
                .distinct()
                .collect()
            )
            touched_rels.update(r[0] for r in incident)

        if stale_edges is not None:
            se = stale_edges.select(*EDGE_KEY).distinct().cache()
            cached.append(se)
            touched_rels.update(r[0] for r in se.select("rel_label").distinct().collect())

        if touched_rels:
            edges_out = self.edges(rel_labels=sorted(touched_rels))
            if sid is not None:
                edges_out = edges_out.join(
                    F.broadcast(sid.withColumnRenamed("id", "src_id")), ["src_id"], "left_anti"
                ).join(
                    F.broadcast(sid.withColumnRenamed("id", "dst_id")), ["dst_id"], "left_anti"
                )
            if stale_edges is not None:
                edges_out = edges_out.join(se, EDGE_KEY, "left_anti")

        try:
            return self.commit_partial(
                nodes_out,
                edges_out,
                touched_labels,
                sorted(touched_rels),
                stage,
                update_tag,
            )
        finally:
            for df in cached:
                df.unpersist()
