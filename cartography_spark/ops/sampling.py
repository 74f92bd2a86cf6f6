"""Deterministic sampling for training-data pipelines.

``rand()``-based sampling is the wrong tool at 10^12 rows: a retried task
re-draws different rows (breaking resumability), and two engines can never
agree on the sample (breaking oracle checks and A/B reproducibility).  The
standard fix is content-addressed sampling — hash a stable key and keep the
row iff the hash falls below the rate threshold.  Pure map-side, no
shuffle, whole-stage codegen, identical result at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hex_threshold(rate: float) -> str:
    """Rate -> 4-hex-digit threshold in the 16-bit md5-prefix space.

    'zzzz' sorts above every hex string, so rate >= 1 keeps everything.
    """
    if rate >= 1.0:
        return "zzzz"
    n = max(int(round(rate * 65536)), 0)
    if n >= 65536:
        # rates just under 1.0 (e.g. 0.999997) round up to 65536, which
        # formats as the 5-char '10000' and lexicographically keeps only
        # hashes starting with '0' — clamp to keep-everything instead
        return "zzzz"
    return format(n, "04x")


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    rate_by: tuple[str, dict[str, float]] | None = None,
) -> DataFrame:
    """Keep rows whose md5(key) 16-bit prefix falls under the rate threshold.

    ``rate_by=(strata_col, {value: rate})`` overrides the global rate per
    stratum — e.g. downsample a boilerplate-heavy source harder, or an
    over-represented language (the Pile/ROOTS-style per-source weights).

    Deterministic across runs, partitionings and engines (md5 of the
    decimal key string is bit-identical in ANSI SQL), so a resumed pipeline
    re-derives exactly the same sample — the property that makes sampling
    safe inside a checkpointed 10^12-row job.
    """
    h = F.substring(F.md5(F.col(key_col).cast("string")), 1, 4)
    thr = F.lit(_hex_threshold(rate))
    if rate_by is not None:
        strata_col, rates = rate_by
        for value, r in sorted(rates.items()):
            thr = F.when(F.col(strata_col) == value, F.lit(_hex_threshold(r))).otherwise(thr)
    return df.where(h < thr)
