"""Multimodal (image/audio/video) column plumbing.

Beyond-reference north-star capability: treat media payloads as opaque
``binary`` columns with typed metadata, and run decode / feature-extract
/ frame-sample as Arrow-batched Pandas transforms (``mapInPandas``) —
the pattern a 100 TB training-data pipeline uses for real codecs.

The container has no image/audio libraries, so the actual codec step is
STUBBED: ``decode_media`` raises ``NotImplementedError`` and the
pipeline runs a clearly-marked deterministic fake decode instead. The
Spark-side plumbing — binary schema, metadata struct, Arrow batch
transfer in/out of pandas, UDF signatures, output schema — is real and
oracle-tested (the fake decode is pure arithmetic on payload bytes, so
DuckDB can mirror it exactly).

100 TB notes: payload bytes ride the same columnar scan as everything
else (Parquet binary + dictionary-encoded metadata); mapInPandas
processes one Arrow batch per call so Python overhead amortizes across
thousands of rows; decode parallelism = partition count, no shuffle is
introduced — the operator is a pure map. Keep
``spark.sql.files.maxPartitionBytes`` sized so one partition of
payloads fits executor memory (media rows are fat: ~MBs/row vs ~KBs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: deterministic media-type assignment for the synthetic corpus
MEDIA_TYPES = ("image", "audio", "video")

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, first_byte bigint, "
    "width bigint, height bigint, n_frames bigint, frame_step bigint, "
    "last_frame_offset bigint"
)


def decode_media(payload: bytes, media_type: str):
    """REAL codec entry point — NOT IMPLEMENTED in this container.

    A deployment with codec libraries (pillow/librosa/pyav) plugs them
    in here; everything downstream (schemas, batching, partitioning)
    is unchanged.
    """
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "environment; the pipeline uses fake_decode() instead"
    )


def fake_decode(n_bytes: int) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: derive (width, height,
    n_frames) from payload size. Pure arithmetic → oracle-mirrorable."""
    return 64 + n_bytes % 64, 64 + (7 * n_bytes) % 64, 1 + n_bytes % 8


def attach_binary(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize the multimodal layout from the documents table:
    payload = utf-8 bytes of the text (an opaque blob from here on),
    media_type cycled deterministically by id."""
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col(id_col) % len(MEDIA_TYPES) + 1).cast("int"),
        ).alias("media_type"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload,
    media_type): byte stats + fake-decoded dimensions + frame-sampling
    offsets. This is the real mapInPandas plumbing a codec-backed
    deployment reuses verbatim."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf["payload"].map(len)
            width, height, frames = zip(*(fake_decode(x) for x in n))
            frames = pd.Series(frames, index=pdf.index)
            step = n // frames
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n,
                    "first_byte": pdf["payload"].map(lambda b: b[0] if len(b) else -1),
                    "width": pd.Series(width, index=pdf.index),
                    "height": pd.Series(height, index=pdf.index),
                    "n_frames": frames,
                    "frame_step": step,
                    "last_frame_offset": (frames - 1) * step,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frame_offsets(features: DataFrame) -> DataFrame:
    """Frame-sample plan: one row per sampled frame offset, derived
    from the extracted (n_frames, frame_step). JVM-side explode — the
    Python boundary was crossed once in extract_features."""
    return features.select(
        "doc_id",
        "media_type",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_frames") - 1),
                lambda i: i * F.col("frame_step"),
            )
        ).alias("frame_offset"),
    )
