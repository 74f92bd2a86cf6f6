"""Schema -> DataFrame compiler: the engine's ingestion core.

This is the Spark-first restatement of the reference's ingestion query
builder (reference: cartography/graph/querybuilder.py:349-401 builds one
Cypher ``UNWIND $DictList MERGE`` text; reference: cartography/client/core/tx.py:194-215
executes it in 10k-row batches).  Here there is no query text and no row
batching: a NodeSchema compiles to a *projection* producing canonical node
rows and one *equi-join per declared relationship* producing canonical edge
rows; Catalyst plans the physical execution, and the snapshot store applies
MERGE semantics set-wise.

Canonical long-table layouts (one unioned table each, partitioned by label —
the Spark analog of Neo4j labels + per-key indexes):

  nodes: id string, label string, props map<string,string>,
         extra_labels array<string>, firstseen long, lastupdated long
  edges: src_id string, src_label string, rel_label string,
         dst_id string, dst_label string, props map<string,string>,
         firstseen long, lastupdated long

Property values are stringified (lists/structs JSON-encoded) — the reference
graph is dynamically typed (SURVEY.md §1.2), and a map column keeps the long
table schema-stable while remaining filterable via ``element_at``.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cartography_spark.core.model import LinkDirection, NodeSchema, PropertyRef, RelSchema

NODE_COLUMNS = ["id", "label", "props", "extra_labels", "firstseen", "lastupdated"]
EDGE_COLUMNS = [
    "src_id",
    "src_label",
    "rel_label",
    "dst_id",
    "dst_label",
    "props",
    "firstseen",
    "lastupdated",
]

NODES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("extra_labels", T.ArrayType(T.StringType()), True),
        T.StructField("firstseen", T.LongType(), True),
        T.StructField("lastupdated", T.LongType(), False),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src_id", T.StringType(), False),
        T.StructField("src_label", T.StringType(), False),
        T.StructField("rel_label", T.StringType(), False),
        T.StructField("dst_id", T.StringType(), False),
        T.StructField("dst_label", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("firstseen", T.LongType(), True),
        T.StructField("lastupdated", T.LongType(), False),
    ]
)


def _stringify(df: DataFrame, col: str) -> Column:
    """Render any input column as a string graph property.

    Complex types are JSON-encoded (the reference JSON-encodes Condition
    blobs the same way, intel/aws/iam.py:556-557); scalars are cast.
    """
    dtype = df.schema[col].dataType
    # df[col] (not F.col) so references stay unambiguous after self-named joins
    if isinstance(dtype, (T.ArrayType, T.StructType, T.MapType)):
        return F.to_json(df[col])
    return df[col].cast("string")


def _ref_col(df: DataFrame, ref: PropertyRef, kwargs: Mapping[str, object]) -> Column:
    """Resolve a PropertyRef against the batch (column) or run kwargs (literal)."""
    if ref.set_in_kwargs:
        if ref.source not in kwargs:
            raise KeyError(f"PropertyRef kwarg '{ref.source}' missing from run kwargs")
        return F.lit(kwargs[ref.source]).cast("string")
    return _stringify(df, ref.source)


def compile_nodes(
    batch: DataFrame,
    schema: NodeSchema,
    update_tag: int,
    kwargs: Mapping[str, object] | None = None,
) -> DataFrame:
    """Project an input batch into canonical node rows for one label.

    Semantics of the reference's node MERGE (querybuilder.py:372-401):
      * id from the schema's id ref;
      * duplicate ids inside one batch collapse to a single row via a
        deterministic content-hash window (see inline note — Spark batches
        are unordered, so sequential last-write-wins has no analog);
      * ``lastupdated`` stamped with the run tag; ``firstseen`` left NULL —
        the store resolves it to ``coalesce(existing.firstseen, tag)`` at
        commit time, reproducing ``ON CREATE SET firstseen``.
    """
    kwargs = kwargs or {}
    prop_cols = [
        _ref_col(batch, ref, kwargs).alias(name) for name, ref in schema.properties.items()
    ]
    prop_map = (
        F.map_filter(
            F.map_from_arrays(
                F.array(*[F.lit(n) for n in schema.properties]),
                F.array(*[c for c in prop_cols]),
            ),
            lambda _, v: v.isNotNull(),
        )
        if schema.properties
        else F.lit(None).cast("map<string,string>")
    )

    out = batch.select(
        _ref_col(batch, schema.id, kwargs).alias("id"),
        F.lit(schema.label).alias("label"),
        prop_map.alias("props"),
        F.array(*[F.lit(x) for x in schema.extra_labels]).alias("extra_labels")
        if schema.extra_labels
        else F.lit(None).cast("array<string>").alias("extra_labels"),
        F.lit(None).cast("long").alias("firstseen"),
        F.lit(int(update_tag)).alias("lastupdated"),
    ).where(F.col("id").isNotNull())

    # Intra-batch duplicate-id collapse (A5 in SURVEY.md §2.4).  NOTE on
    # semantics: the reference applies MERGE rows sequentially, so its winner
    # is the batch's last row; a distributed batch has no row order, so the
    # winner here is selected by a deterministic content hash — stable across
    # re-runs and partitionings, but NOT "last" in any input sense.  When
    # duplicate ids carry different props the surviving props may differ from
    # the reference's; callers that care must dedupe upstream.
    w = Window.partitionBy("id").orderBy(F.xxhash64(F.to_json(F.struct("props"))).desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _matcher_condition(
    batch: DataFrame,
    targets: DataFrame,
    rel: RelSchema,
    kwargs: Mapping[str, object],
) -> Column:
    """Build the equi-join condition batch x target-nodes for one RelSchema.

    Target attribute ``id`` matches the node id column; any other attribute
    matches ``props[attr]``.  ``ignore_case`` lowers both sides (reference:
    querybuilder.py:112-131 pushes toLower into the match the same way).
    """
    conds = []
    for attr, ref in rel.matcher.keys.items():
        left = _ref_col(batch, ref, kwargs)
        right = targets["id"] if attr == "id" else F.element_at(targets["props"], attr)
        if ref.ignore_case:
            left, right = F.lower(left), F.lower(right)
        conds.append(left == right)
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    return cond


def compile_edges(
    batch: DataFrame,
    schema: NodeSchema,
    existing_nodes: DataFrame,
    update_tag: int,
    kwargs: Mapping[str, object] | None = None,
    broadcast_targets: bool = True,
    selected_relationships: "set | frozenset | tuple | list | None" = None,
) -> DataFrame | None:
    """Produce canonical edge rows for every relationship a schema declares.

    One inner equi-join per RelSchema against the *current* node table for
    the target label (reference runs an OPTIONAL MATCH then drops nulls,
    querybuilder.py:153-256 — net effect is an inner join).  Each join's
    result is unioned (the reference wraps each rel in ``CALL {} UNION``,
    querybuilder.py:259-291, for exactly this independence).

    ``selected_relationships`` loads a SUBSET of the declared rels (partial
    syncs): pass RelSchema objects and/or rel_label strings.  Selecting a
    relationship the schema does not declare raises, and the sub-resource
    rel stays selectable — both mirroring reference
    querybuilder.py:307-346 (_filter_selected_relationships).

    Scale: target id spaces are dimension-sized (accounts, orgs, groups) —
    broadcast by default; for genuinely large targets pass
    ``broadcast_targets=False`` and let AQE pick the strategy.
    """
    kwargs = kwargs or {}
    rels = schema.all_rels()
    if selected_relationships is not None:
        wanted = {
            r.rel_label if isinstance(r, RelSchema) else str(r)
            for r in selected_relationships
        }
        declared = {r.rel_label for r in rels}
        unknown = wanted - declared
        if unknown:
            raise ValueError(
                f"selected_relationships {sorted(unknown)} not declared on "
                f"'{schema.label}' (declared: {sorted(declared)}); reference "
                "querybuilder.py:323-339 raises the same"
            )
        rels = tuple(r for r in rels if r.rel_label in wanted)
    if not rels:
        return None

    pieces: list[DataFrame] = []
    for rel in rels:
        targets = existing_nodes.where(F.col("label") == rel.target_label).select(
            "id", "label", "props"
        )
        if broadcast_targets:
            targets = F.broadcast(targets)
        cond = _matcher_condition(batch, targets, rel, kwargs)
        joined = batch.join(targets, cond, "inner")

        declaring_id = _ref_col(batch, schema.id, kwargs)
        if rel.direction == LinkDirection.OUTWARD:
            src_id, src_label = declaring_id, F.lit(schema.label)
            dst_id, dst_label = targets["id"], F.lit(rel.target_label)
        else:
            src_id, src_label = targets["id"], F.lit(rel.target_label)
            dst_id, dst_label = declaring_id, F.lit(schema.label)

        rel_props = (
            F.map_filter(
                F.map_from_arrays(
                    F.array(*[F.lit(n) for n in rel.properties]),
                    F.array(*[_ref_col(batch, r, kwargs) for r in rel.properties.values()]),
                ),
                lambda _, v: v.isNotNull(),
            )
            if rel.properties
            else F.lit(None).cast("map<string,string>")
        )

        pieces.append(
            joined.select(
                src_id.alias("src_id"),
                src_label.alias("src_label"),
                F.lit(rel.rel_label).alias("rel_label"),
                dst_id.alias("dst_id"),
                dst_label.alias("dst_label"),
                rel_props.alias("props"),
                F.lit(None).cast("long").alias("firstseen"),
                F.lit(int(update_tag)).alias("lastupdated"),
            )
        )

    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(["src_id", "rel_label", "dst_id"])


def empty_nodes(spark) -> DataFrame:
    return spark.createDataFrame([], NODES_SCHEMA)


def empty_edges(spark) -> DataFrame:
    return spark.createDataFrame([], EDGES_SCHEMA)
