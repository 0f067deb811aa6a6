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
    """Arrow-batched decode: binary payload → feature columns."""
    flat = blobs.select(
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


QUERIES = {
    "multimodal_decode_features": multimodal_features,
}

ORACLE = {
    "multimodal_decode_features": MULTIMODAL_SQL,
}
