"""Set-equality assertion helpers.

Port of the reference's integration helpers check_nodes / check_rels
(reference: tests/integration/util.py:11-61) re-expressed as DataFrame
collectors over the nodes/edges tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def check_nodes(store, label: str, attrs: list[str]) -> set[tuple]:
    """{(attr1, attr2, ...)} for all nodes of `label`; 'id' reads the id
    column, anything else reads props[attr]."""
    df = store.nodes().where(F.col("label") == label)
    cols = [
        F.col("id") if a == "id" else F.element_at("props", a).alias(a) for a in attrs
    ]
    return {tuple(r) for r in df.select(*cols).collect()}


def check_rels(store, src_label: str, rel: str, dst_label: str) -> set[tuple]:
    """{(src_id, dst_id)} for all rel edges between the two labels."""
    df = store.edges().where(
        (F.col("rel_label") == rel)
        & (F.col("src_label") == src_label)
        & (F.col("dst_label") == dst_label)
    )
    return {(r.src_id, r.dst_id) for r in df.select("src_id", "dst_id").collect()}
