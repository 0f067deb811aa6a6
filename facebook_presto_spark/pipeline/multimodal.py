"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference treats binary as a first-class scalar type (varbinary,
operator/scalar/VarbinaryFunctions.java) but has no media operators.  This
module provides the Spark-side plumbing a multimodal training pipeline
needs — schema, partitioning, Arrow batch shape — with the actual media
decode STUBBED (no image/audio libs in this container):

- ``with_blob``        — pack a binary payload column + metadata struct
                         (the storage schema: media as opaque bytes next to
                         typed metadata, never parsed by the engine).
- ``decode_features``  — Arrow-batched ``mapInPandas`` that would decode
                         media and emit features.  The real decoder body is
                         ``_decode_real`` (raises NotImplementedError); the
                         wired implementation is ``_decode_stub`` — a
                         deterministic fake deriving "dimensions" from byte
                         length so the distributed plumbing is fully
                         exercised and oracle-checkable.

Scale design: mapInPandas streams Arrow batches (10k rows/batch per
session config) — decode cost is per-executor CPU with zero driver
involvement; binary payloads never shuffle (features are extracted
before any wide op).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from facebook_presto_spark.plans.tpch import _t

FEATURE_SCHEMA = (
    "doc_id bigint, fmt string, n_bytes bigint, width int, height int, aspect double"
)


def with_blob(docs: DataFrame) -> DataFrame:
    """Pack text bytes as the stand-in media payload + metadata struct."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("img/fake").alias("fmt"),
            F.octet_length(F.col("text")).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_real(pdf: pd.DataFrame) -> pd.DataFrame:
    """Real decoder — requires PIL/libav, absent in this container."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; the pipeline wires _decode_stub instead"
    )


def _decode_stub(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: derive 'image dimensions' from payload
    length.  Vectorized over the Arrow batch — the exact shape a real
    decoder would have (bytes in, feature columns out)."""
    n = pdf["payload"].map(len)
    width = (n % 64 + 1).astype("int32")
    height = (n // 64 + 1).astype("int32")
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "fmt": pdf["fmt"],
            "n_bytes": n.astype("int64"),
            "width": width,
            "height": height,
            "aspect": width.astype("float64") / height.astype("float64"),
        }
    )


def decode_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched decode: binary payload → feature columns.

    Media tables arrive in few very-wide parquet splits, so like the dedup
    signature path the CPU-heavy decode is round-robin repartitioned to
    the core count first; payloads never shuffle again after this.
    """
    n_parts = blobs.sparkSession.sparkContext.defaultParallelism
    flat = blobs.repartition(n_parts).select(
        "doc_id", "payload", F.col("meta.fmt").alias("fmt")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_stub(pdf)

    return flat.mapInPandas(run, schema=FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: pack blobs → Arrow-batched decode → features.  The
    oracle reproduces the stub arithmetic in SQL, proving the mapInPandas
    path computes exactly what it should."""
    docs = _t(spark, sf_dir, "documents")
    return decode_features(with_blob(docs))


MULTIMODAL_SQL = """
SELECT doc_id,
       'img/fake' AS fmt,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(strlen(text) % 64 + 1 AS INT) AS width,
       CAST(strlen(text) // 64 + 1 AS INT) AS height,
       CAST(strlen(text) % 64 + 1 AS DOUBLE) / (strlen(text) // 64 + 1) AS aspect
FROM documents
"""


# ---------------------------------------------------------------------------
# resize: payload → payload (the 1→1 re-encode shape)
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, out_width int, out_height int, "
    "out_bytes bigint"
)

_TARGET_MAX_DIM = 32


def _resize_stub(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake resize: scale (width, height) from the stub
    decode so the longest side is _TARGET_MAX_DIM (never upscale), and
    're-encode' to a proportional byte count.  A real implementation would
    swap the arithmetic for PIL `Image.resize` + `save` over the payload —
    batch shape and schema are identical."""
    n = pdf["payload"].map(len)
    width = (n % 64 + 1).astype("int64")
    height = (n // 64 + 1).astype("int64")
    longest = width.where(width >= height, height)
    scale = (_TARGET_MAX_DIM / longest).clip(upper=1.0)
    import numpy as np

    # floor explicitly: SQL CAST(double AS BIGINT) rounds in some engines
    out_w = pd.Series(np.floor(width * scale), index=pdf.index).astype("int64").clip(lower=1)
    out_h = pd.Series(np.floor(height * scale), index=pdf.index).astype("int64").clip(lower=1)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "width": width.astype("int32"),
            "height": height.astype("int32"),
            "out_width": out_w.astype("int32"),
            "out_height": out_h.astype("int32"),
            "out_bytes": (out_w * out_h * 3).astype("int64"),  # RGB
        }
    )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline: blob → bounded-dimension thumbnail features."""
    docs = _t(spark, sf_dir, "documents")
    n_parts = spark.sparkContext.defaultParallelism
    flat = with_blob(docs).repartition(n_parts).select("doc_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _resize_stub(pdf)

    return flat.mapInPandas(run, schema=RESIZE_SCHEMA)


MULTIMODAL_RESIZE_SQL = """
WITH dims AS (
  SELECT doc_id,
         strlen(text) % 64 + 1 AS w,
         strlen(text) // 64 + 1 AS h
  FROM documents
), scaled AS (
  SELECT doc_id, w, h,
         least(32.0 / greatest(w, h), 1.0) AS s
  FROM dims
)
SELECT doc_id,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(greatest(CAST(floor(w * s) AS BIGINT), 1) AS INT) AS out_width,
       CAST(greatest(CAST(floor(h * s) AS BIGINT), 1) AS INT) AS out_height,
       CAST(greatest(CAST(floor(w * s) AS BIGINT), 1)
            * greatest(CAST(floor(h * s) AS BIGINT), 1) * 3 AS BIGINT) AS out_bytes
FROM scaled
"""


# ---------------------------------------------------------------------------
# frame sampling: payload → N rows (the 1→N generator shape)
# ---------------------------------------------------------------------------

FRAMES_SCHEMA = "doc_id bigint, frame_idx bigint, ts_ms bigint, frame_bytes bigint"

_FRAME_BYTES = 100    # stub: one "frame" per 100 payload bytes
_SAMPLE_EVERY = 10    # keep every 10th frame
_FPS = 30


def _frame_sample_stub(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake frame sampler: payload length defines the frame
    count; every _SAMPLE_EVERY-th frame is emitted with its timestamp.
    Output rows ≫ or ≪ input rows — the generator (UNNEST-like) batch
    shape a real video sampler (pyav keyframe iteration) would produce."""
    n_frames = pdf["payload"].map(len) // _FRAME_BYTES
    reps = (n_frames // _SAMPLE_EVERY + (n_frames % _SAMPLE_EVERY > 0)).astype("int64")
    doc_ids = pdf["doc_id"].repeat(reps)
    import numpy as np

    idx = np.concatenate(
        [np.arange(0, int(nf), _SAMPLE_EVERY) for nf in n_frames]
    ) if len(pdf) else np.array([], dtype="int64")
    return pd.DataFrame(
        {
            "doc_id": doc_ids.to_numpy(),
            "frame_idx": idx.astype("int64"),
            "ts_ms": (idx * 1000 // _FPS).astype("int64"),
            "frame_bytes": np.full(len(idx), _FRAME_BYTES, dtype="int64"),
        }
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline: one input blob → N sampled-frame rows."""
    docs = _t(spark, sf_dir, "documents")
    n_parts = spark.sparkContext.defaultParallelism
    flat = with_blob(docs).repartition(n_parts).select("doc_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _frame_sample_stub(pdf)

    return flat.mapInPandas(run, schema=FRAMES_SCHEMA)


MULTIMODAL_FRAMES_SQL = """
WITH vids AS (
  SELECT doc_id, strlen(text) // 100 AS n_frames FROM documents
)
SELECT doc_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(f * 1000 // 30 AS BIGINT) AS ts_ms,
       CAST(100 AS BIGINT) AS frame_bytes
FROM vids, LATERAL (
  SELECT unnest(range(0, CAST(n_frames AS BIGINT), 10)) AS f
) t
WHERE n_frames > 0
"""


QUERIES = {
    "multimodal_decode_features": multimodal_features,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLE = {
    "multimodal_decode_features": MULTIMODAL_SQL,
    "multimodal_resize": MULTIMODAL_RESIZE_SQL,
    "multimodal_frame_sample": MULTIMODAL_FRAMES_SQL,
}
