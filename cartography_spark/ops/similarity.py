"""Similarity search over embedding columns.

Two tiers:
  * brute-force cosine top-k — the exact baseline; one pass over the
    embeddings table with a JVM-native dot product (``F.aggregate`` over
    ``zip_with``), top-k via window/orderBy.
  * LSH-bucketed ANN — deterministic random-hyperplane signatures
    (md5-seeded, no RNG so runs are reproducible) bucket the table; a query
    probes only its bucket (and optional neighbor buckets).  The scale path:
    buckets are the partition key, so a 10^12-row table prunes to one
    bucket's partitions.

Embeddings are float32 in storage; all arithmetic is double (matches the
DuckDB oracle).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_topk_arrow(
    embeddings: DataFrame,
    query_vecs: list[list[float]],
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k for MANY queries via a numpy/BLAS kernel.

    The production path for brute-force similarity: each Arrow batch of
    vectors becomes one (batch x dim) matrix, all queries score in a single
    GEMM (~30x less per-element overhead than JVM higher-order functions),
    and **top-k reduction happens inside the kernel** — each batch emits at
    most k rows per query, so the Arrow return path and the final shuffle
    carry candidates, never the full score matrix.  A global per-query
    window picks the final top-k.
    Output: query_idx, vec_id, cosine (double), exactly k rows per query.
    """
    import numpy as np
    from pyspark.sql import types as T

    q = np.asarray(query_vecs, dtype=np.float64)  # (nq, dim)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)

    out_schema = T.StructType(
        [
            T.StructField("query_idx", T.IntegerType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def kernel(it):
        import pandas as pd

        for pdf in it:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)  # (b, dim)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            scores = (m / norms[:, None]) @ qn.T  # (b, nq)
            b, nq = scores.shape
            ids = pdf[id_col].to_numpy()
            kk = min(k, b)
            # per-query partial top-k within this batch
            top = np.argpartition(-scores, kk - 1, axis=0)[:kk]  # (kk, nq)
            qi = np.tile(np.arange(nq, dtype=np.int32), kk)
            yield pd.DataFrame(
                {
                    "query_idx": qi,
                    "vec_id": ids[top.ravel()],
                    "cosine": np.take_along_axis(scores, top, axis=0).ravel(),
                }
            )

    sel = embeddings.select(F.col(id_col).cast("long").alias(id_col), vec_col)
    cands = sel.mapInPandas(kernel, out_schema)
    w = Window.partitionBy("query_idx").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        cands.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.
    Output: vec_id, cosine (6dp), ordered desc, ties broken by vec_id."""
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.round(_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn)), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j derives from
    md5(plane:j) — stable across runs/engines, no RNG state."""
    import hashlib

    comps = []
    for j in range(dim):
        h = int(hashlib.md5(f"{plane_idx}:{j}".encode()).hexdigest()[:8], 16)
        comps.append((h % 2001 - 1000) / 1000.0)
    return comps


def lsh_bucket(
    embeddings: DataFrame,
    dim: int,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector a sign-bit bucket over deterministic hyperplanes.
    Output: vec_id, embedding, bucket (long)."""
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, p)])
        bit = (_dot(F.col(vec_col), plane) >= 0).cast("long")
        bucket = bucket + bit * F.lit(1 << p).cast("long")
    return embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        bucket.alias("bucket"),
    )


def ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 20,
    num_planes: int = 6,
    probe_radius: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in buckets within hamming
    distance ``probe_radius`` of the query's bucket (multi-probe LSH).

    Defaults probe ~1/3 of the 2^6 bucket space — a 3x prune with usable
    recall even on weakly-clustered data (random-hyperplane collision
    probability degrades as neighbor similarity drops; radius-2 multi-probe
    compensates).  Recall vs brute force is asserted in tests."""
    from itertools import combinations

    dim = len(query_vec)
    bucketed = lsh_bucket(embeddings, dim, num_planes, id_col, vec_col)

    qb = 0
    for p in range(num_planes):
        plane = _hyperplane(dim, p)
        d = sum(float(a) * b for a, b in zip(query_vec, plane))
        if d >= 0:
            qb |= 1 << p
    probes = {qb}
    for r in range(1, probe_radius + 1):
        for flips in combinations(range(num_planes), r):
            m = 0
            for f in flips:
                m |= 1 << f
            probes.add(qb ^ m)

    cand = bucketed.where(F.col("bucket").isin(sorted(probes)))
    return cosine_topk(cand, query_vec, k, "vec_id", "embedding")
