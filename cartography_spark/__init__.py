"""cartography_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the semantics of lyft/cartography
(reference: /root/reference, read-only) as an idiomatic PySpark batch
pipeline over snapshot-versioned node/edge (triple) tables:

    extract -> link -> canonicalize -> materialize -> cleanup -> analysis

The reference upserts labeled nodes/relationships into Neo4j via Cypher
``UNWIND $DictList MERGE`` batches (reference: cartography/client/core/tx.py:194-215)
and deletes stale elements whose ``lastupdated`` does not match the run's
update tag (reference: cartography/graph/cleanupbuilder.py:15-41).  Here the
same semantics are pure DataFrame programs: MERGE becomes an anti-join +
union snapshot commit (Iceberg ``MERGE INTO`` at production scale), and stale
cleanup becomes a snapshot-diff anti-join.

Nothing in this package is a translation of reference code; all citations in
docstrings are *semantic parity* pointers for auditability.
"""

__version__ = "0.1.0"

from cartography_spark.core.model import (  # noqa: F401
    LinkDirection,
    NodeSchema,
    PropertyRef,
    RelSchema,
    TargetNodeMatcher,
)
