"""Multimodal span handling: media metadata extraction + decode plumbing.

Media spans are opaque references/bytes with typed metadata; the Spark-side
plumbing (schema, partitioning, Arrow batch shape) is real and tested, while
the actual codec work is stubbed behind ``DecodeUnavailable`` — the sandbox
image ships no image/audio libraries.  At production scale the stub body is
replaced by PIL/torchaudio calls inside the same ``mapInPandas`` iterator;
nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DecodeUnavailable(NotImplementedError):
    """Raised by the real-decode path; the deterministic fake is the default
    in this sandbox."""


def media_metadata(spans: DataFrame) -> DataFrame:
    """Parse media_ref URIs into typed metadata — JVM-native, no UDF.
    Output: doc_id, span_idx, kind, media_ref, scheme, ext."""
    media = spans.where(F.col("kind").isin("image", "audio", "video")).where(
        F.col("media_ref").isNotNull()
    )
    return media.select(
        "doc_id",
        "span_idx",
        "kind",
        "media_ref",
        F.regexp_extract("media_ref", r"^([a-z0-9]+)://", 1).alias("scheme"),
        F.regexp_extract("media_ref", r"\.([A-Za-z0-9]+)$", 1).alias("ext"),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("span_idx", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_media(spans: DataFrame, fake: bool = True, feature_dim: int = 8) -> DataFrame:
    """Decode / feature-extract media spans via ``mapInPandas``.

    ``fake=True`` (sandbox default) produces deterministic pseudo-features
    derived from the md5 of the media_ref — the batch shape, schema, and
    partitioning are exactly what a real decoder would use.  ``fake=False``
    raises DecodeUnavailable (no codecs in this image).
    """
    media = spans.where(F.col("kind").isin("image", "audio", "video")).select(
        "doc_id", "span_idx", "kind", "media_ref"
    )

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not fake:
                raise DecodeUnavailable(
                    "real media decoding requires PIL/torchaudio (not in sandbox)"
                )
            feats, widths, heights, frames = [], [], [], []
            for ref in pdf["media_ref"]:
                h = hashlib.md5(ref.encode()).hexdigest()
                widths.append(int(h[:4], 16) % 1920 + 1)
                heights.append(int(h[4:8], 16) % 1080 + 1)
                frames.append(int(h[8:12], 16) % 300 + 1)
                feats.append(
                    [
                        (int(h[(12 + 2 * j) % 24 : (12 + 2 * j) % 24 + 2], 16) % 1000) / 1000.0
                        for j in range(feature_dim)
                    ]
                )
            out = pdf.copy()
            out["width"] = pd.array(widths, dtype="int32")
            out["height"] = pd.array(heights, dtype="int32")
            out["n_frames"] = pd.array(frames, dtype="int32")
            out["feature"] = feats
            yield out

    # Repartition on doc_id so each Arrow batch holds co-located docs (a real
    # decoder benefits from fetching a doc's media together).
    return media.repartition("doc_id").mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample_plan(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame index (JVM-side
    sequence explode; a real pipeline hands these to the decoder)."""
    return decoded.select(
        "doc_id",
        "span_idx",
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
