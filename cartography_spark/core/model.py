"""Declarative graph schema objects.

Semantic parity with the reference's model layer:
  * PropertyRef           — reference: cartography/models/core/common.py:1-58
  * TargetNodeMatcher     — reference: cartography/models/core/relationships.py:65-84
  * RelSchema             — reference: cartography/models/core/relationships.py:87-133
  * NodeSchema            — reference: cartography/models/core/nodes.py:49-102
  * LinkDirection         — reference: cartography/models/core/relationships.py:13-35

Differences by design (Spark-first, not a port):
  * A PropertyRef binds to a *DataFrame column* (or a run-level kwarg),
    never to a dict key.
  * ``firstseen`` / ``lastupdated`` are engine-reserved exactly as in the
    reference (nodes.py:32-37): module authors never set them; the loader
    stamps ``lastupdated`` from the run's update tag and the store preserves
    ``firstseen`` across upserts.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Mapping


class LinkDirection(Enum):
    """Direction of a relationship relative to the *declaring* node.

    OUTWARD: (declaring)-[:REL]->(target); INWARD: (target)-[:REL]->(declaring).
    Reference: cartography/models/core/relationships.py:13-35.
    """

    INWARD = "INWARD"
    OUTWARD = "OUTWARD"


@dataclass(frozen=True)
class PropertyRef:
    """Bind a graph property to an input column or a run-level kwarg.

    ``source``       column name in the input batch (or kwarg name).
    ``set_in_kwargs`` True -> value comes from a run-level parameter and is
                      attached as a literal column (broadcast constant).
    ``ignore_case``  case-insensitive matching when used inside a
                      TargetNodeMatcher (join on lower()).
    ``extra_index``  hint that this column is a join key at scale; the store
                      uses these to pick clustering/sort columns (the Spark
                      analog of the reference's CREATE INDEX,
                      querybuilder.py:404-453 — indexes themselves are a no-op
                      on columnar storage).
    """

    source: str
    set_in_kwargs: bool = False
    ignore_case: bool = False
    extra_index: bool = False


@dataclass(frozen=True)
class TargetNodeMatcher:
    """{target node attribute -> PropertyRef} equi-join specification."""

    keys: Mapping[str, PropertyRef]


@dataclass(frozen=True)
class RelSchema:
    """Declares one relationship family from the declaring node.

    The loader turns each RelSchema into one equi-join between the input
    batch and the target label's id space; rows whose target is absent are
    dropped (inner-join), mirroring the reference's
    ``WITH ... WHERE j IS NOT NULL`` gate (querybuilder.py:170-178).
    """

    target_label: str
    rel_label: str
    direction: LinkDirection
    matcher: TargetNodeMatcher
    properties: Mapping[str, PropertyRef] = field(default_factory=dict)


@dataclass(frozen=True)
class NodeSchema:
    """Declares a node family: label, id, properties, relationships.

    ``sub_resource_rel`` is the tenancy edge (AWSAccount / OktaOrganization /
    ...): reference nodes.py:71-84. It scopes cleanup.
    """

    label: str
    id: PropertyRef
    properties: Mapping[str, PropertyRef] = field(default_factory=dict)
    extra_labels: tuple[str, ...] = ()
    sub_resource_rel: RelSchema | None = None
    other_rels: tuple[RelSchema, ...] = ()

    def all_rels(self) -> tuple[RelSchema, ...]:
        rels = tuple(self.other_rels)
        if self.sub_resource_rel is not None:
            rels = (self.sub_resource_rel,) + rels
        return rels
