"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference treats binary as a first-class scalar type (varbinary,
operator/scalar/VarbinaryFunctions.java) but has no media operators.  This
module provides the Spark-side plumbing a multimodal training pipeline
needs — schema, partitioning, Arrow batch shape.  Since round 4 the
decode is REAL for the uncompressed container formats (BMP and PCM16
WAV — header + raw array, parsed with NumPy alone; see
``decode_media``/``media_roundtrip``), and since round 5 the transform
operators are real over those codecs too: ``multimodal_resize`` is a
nearest-neighbor downscale of decoded 24-bit BMP pixels re-encoded
through the real BMP layout, and ``multimodal_frame_sample`` windows
decoded PCM16 samples into timestamped frames with per-window RMS.
Compressed formats (JPEG/PNG/GIF) still raise loudly because codec
libraries are absent from this container:

- ``with_blob``        — pack a binary payload column + metadata struct
                         (the storage schema: media as opaque bytes next to
                         typed metadata, never parsed by the engine).
- ``decode_features``  — Arrow-batched ``mapInPandas`` plumbing-only
                         query (deterministic byte-length arithmetic via
                         ``_decode_stub``), kept as the HEADLINE bench
                         entry so cross-round timings stay comparable;
                         the real decode paths are covered by
                         ``media_roundtrip``/``multimodal_resize``/
                         ``multimodal_frame_sample``.

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
# resize: payload → payload (the 1→1 re-encode shape), REAL since round 5
#
# Nearest-neighbor downscale of a decoded 24-bit BMP, re-encoded through
# the real BMP layout (row padding, bottom-up, BGR) — pure NumPy, no
# codec library needed.  The oracle replays the generating pixel
# arithmetic through the same integer NN sampling (src = dst*size//out),
# so a hash-match proves decode → resample → re-encode end to end.
# Compressed magics still raise loudly in decode_media (unchanged).
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, out_width int, out_height int, "
    "out_bytes bigint, mean_r double, mean_g double, mean_b double"
)

_TARGET_MAX_DIM = 8  # < max generated BMP width (19) so downscaling is real


def _bmp_pixels(payload: bytes):
    """Decode a 24-bit BMP into a top-down (h, w, 3) RGB uint8 array."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", payload, 10)[0]
    _size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP")
    row_len = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=abs(h) * row_len, offset=offset
    ).reshape(abs(h), row_len)
    px = rows[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:
        px = px[::-1]
    return px[:, :, ::-1]  # BGR → RGB


def _encode_bmp_array(px) -> bytes:
    """Encode a top-down (h, w, 3) RGB array as a real 24-bit BMP."""
    import struct

    import numpy as np

    h, w = px.shape[0], px.shape[1]
    row_len = (w * 3 + 3) // 4 * 4
    img = np.zeros((h, row_len), dtype=np.uint8)
    bgr = px[:, :, ::-1]
    img[:, : w * 3] = bgr.reshape(h, -1)
    pixels = img[::-1].tobytes()  # top-down → bottom-up rows
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    return header + info + pixels


def _resize_nn(px, max_dim: int):
    """Nearest-neighbor downscale so the longest side is ≤ max_dim
    (never upscale); src index = dst_index * src_size // out_size."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    longest = max(w, h)
    if longest <= max_dim:
        return px
    out_w = max(w * max_dim // longest, 1)
    out_h = max(h * max_dim // longest, 1)
    sx = np.arange(out_w) * w // out_w
    sy = np.arange(out_h) * h // out_h
    return px[sy][:, sx]


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline: real BMP payload → NN thumbnail → real BMP bytes.

    out_bytes is the length of the actually re-encoded BMP; the channel
    means are computed from the resized pixels, so the oracle verifies
    the resample arithmetic, not just the dimension bookkeeping.
    """
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n_parts = spark.sparkContext.defaultParallelism
    flat = docs.repartition(n_parts)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                px = _bmp_pixels(_encode_bmp(doc_id))
                small = _resize_nn(px, _TARGET_MAX_DIM)
                out = _encode_bmp_array(small)
                spx = small.astype("float64")
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": px.shape[1], "height": px.shape[0],
                        "out_width": small.shape[1],
                        "out_height": small.shape[0],
                        "out_bytes": len(out),
                        "mean_r": round(float(spx[:, :, 0].mean()), 6),
                        "mean_g": round(float(spx[:, :, 1].mean()), 6),
                        "mean_b": round(float(spx[:, :, 2].mean()), 6),
                    }
                )
            yield pd.DataFrame(rows)

    return flat.mapInPandas(run, schema=RESIZE_SCHEMA)


MULTIMODAL_RESIZE_SQL = """
WITH dims AS (
  SELECT doc_id,
         doc_id % 16 + 4 AS w, doc_id % 8 + 2 AS h,
         greatest(doc_id % 16 + 4, doc_id % 8 + 2) AS longest
  FROM documents
), outs AS (
  SELECT doc_id, w, h,
         CASE WHEN longest <= 8 THEN w
              ELSE greatest(w * 8 // longest, 1) END AS ow,
         CASE WHEN longest <= 8 THEN h
              ELSE greatest(h * 8 // longest, 1) END AS oh
  FROM dims
), sampled AS (
  SELECT o.doc_id, o.w, o.h, o.ow, o.oh,
         (x.x * o.w) // o.ow AS sx, (y.y * o.h) // o.oh AS sy
  FROM outs o,
       LATERAL (SELECT unnest(generate_series(0, o.ow - 1)) AS x) x,
       LATERAL (SELECT unnest(generate_series(0, o.oh - 1)) AS y) y
)
SELECT doc_id,
       CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
       CAST(max(ow) AS INT) AS out_width, CAST(max(oh) AS INT) AS out_height,
       CAST(54 + max(oh) * ((max(ow) * 3 + 3) // 4 * 4) AS BIGINT)
         AS out_bytes,
       round(avg((doc_id + sx + sy) % 256), 6) AS mean_r,
       round(avg((doc_id * 2 + sx) % 256), 6) AS mean_g,
       round(avg((doc_id * 3 + sy) % 256), 6) AS mean_b
FROM sampled
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# frame sampling: payload → N rows (the 1→N generator shape), REAL since
# round 5: PCM16 windows over a decoded WAV — every other 16-sample
# frame is emitted with its timestamp and window RMS, so the oracle
# verifies the actual sample values flowing through the frames.
# ---------------------------------------------------------------------------

FRAMES_SCHEMA = (
    "doc_id bigint, frame_idx bigint, ts_ms bigint, frame_bytes bigint, "
    "rms double"
)

_FRAME_SAMPLES = 16   # PCM window per frame
_SAMPLE_EVERY = 2     # keep every 2nd frame


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over real WAV payloads: decode PCM16, window into
    complete 16-sample frames, keep every 2nd frame; each output row
    carries the frame timestamp (samples/sample-rate) and the window
    RMS computed from the decoded samples."""
    import numpy as np

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n_parts = spark.sparkContext.defaultParallelism
    flat = docs.repartition(n_parts)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                n, sr, _rms = _decode_wav(_encode_wav(doc_id))
                samples = _wav_samples(_encode_wav(doc_id))
                n_frames = n // _FRAME_SAMPLES
                for f in range(0, n_frames, _SAMPLE_EVERY):
                    win = samples[f * _FRAME_SAMPLES:(f + 1) * _FRAME_SAMPLES]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": f,
                            "ts_ms": f * _FRAME_SAMPLES * 1000 // sr,
                            "frame_bytes": _FRAME_SAMPLES * 2,
                            "rms": round(
                                float(np.sqrt((win * win).mean())), 4
                            ),
                        }
                    )
            yield pd.DataFrame(rows)

    return flat.mapInPandas(run, schema=FRAMES_SCHEMA)


MULTIMODAL_FRAMES_SQL = """
WITH smp AS (
  SELECT d.doc_id,
         8000 + (d.doc_id % 3) * 4000 AS sr,
         i.i, i.i // 16 AS f,
         (d.doc_id * 31 + i.i * 17) % 65536 - 32768 AS v
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(0, d.doc_id % 100 + 49)) AS i) i
)
SELECT doc_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(f * 16 * 1000 // sr AS BIGINT) AS ts_ms,
       CAST(32 AS BIGINT) AS frame_bytes,
       round(sqrt(avg(CAST(v AS DOUBLE) * v)), 4) AS rms
FROM smp
WHERE f % 2 = 0 AND f < (doc_id % 100 + 50) // 16
GROUP BY doc_id, f, sr
"""


# ---------------------------------------------------------------------------
# REAL codecs for the uncompressed container formats (round 4)
#
# The decode "stub" boundary was about codec libraries (libjpeg/libav)
# being absent — but BMP (BITMAPINFOHEADER, 24-bit uncompressed) and
# WAV (RIFF PCM16) need no codec: they are header + raw array, fully
# parseable with NumPy.  The encoder below writes the real byte layout
# (row padding, bottom-up rows, BGR order; RIFF/fmt/data chunks) and
# the decoder is an independent parser of the same spec, so the query
# is a true binary round-trip through Arrow batches.  Compressed
# magics (JPEG/PNG/GIF) still raise loudly — that boundary is
# unchanged and documented.
# ---------------------------------------------------------------------------


def _encode_bmp(doc_id: int) -> bytes:
    import struct

    import numpy as np

    w = int(doc_id) % 16 + 4
    h = int(doc_id) % 8 + 2
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    r = (int(doc_id) + x + y) % 256
    g = (int(doc_id) * 2 + x + 0 * y) % 256
    b = (int(doc_id) * 3 + 0 * x + y) % 256
    row_len = (w * 3 + 3) // 4 * 4
    img = np.zeros((h, row_len), dtype=np.uint8)
    # bottom-up rows, BGR byte order
    for yy in range(h):
        row = np.stack([b[yy], g[yy], r[yy]], axis=1).astype(np.uint8)
        img[h - 1 - yy, : w * 3] = row.reshape(-1)
    pixels = img.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    return header + info + pixels


def _decode_bmp(payload: bytes):
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", payload, 10)[0]
    size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP")
    row_len = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=abs(h) * row_len, offset=offset
    ).reshape(abs(h), row_len)
    px = rows[:, : w * 3].reshape(abs(h), w, 3).astype(np.float64)
    if h > 0:
        px = px[::-1]  # bottom-up → top-down
    # BGR → (r, g, b) channel means
    return w, abs(h), px[:, :, 2].mean(), px[:, :, 1].mean(), px[:, :, 0].mean()


def _encode_wav(doc_id: int) -> bytes:
    import struct

    import numpy as np

    n = int(doc_id) % 100 + 50
    sr = 8000 + (int(doc_id) % 3) * 4000
    i = np.arange(n)
    samples = ((int(doc_id) * 31 + i * 17) % 65536 - 32768).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + fmt + b"data" + struct.pack("<I", len(data)) + data
    )


def _decode_wav(payload: bytes):
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    sr = None
    samples = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        clen = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2").astype(np.float64)
        pos += 8 + clen + (clen % 2)
    if sr is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    rms = float(np.sqrt((samples * samples).mean()))
    return len(samples), sr, rms


def _wav_samples(payload: bytes):
    """Decode the PCM16 data chunk into a float64 sample array."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        clen = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"data":
            return np.frombuffer(
                payload[pos + 8:pos + 8 + clen], dtype="<i2"
            ).astype(np.float64)
        pos += 8 + clen + (clen % 2)
    raise ValueError("missing data chunk")


_COMPRESSED_MAGICS = {
    b"\xff\xd8\xff": "JPEG",
    b"\x89PNG": "PNG",
    b"GIF8": "GIF",
}


def decode_media(payload: bytes):
    """Dispatch on magic bytes: real decode for BMP/WAV, loud boundary
    for compressed formats (codec libraries absent — unchanged)."""
    for magic, name in _COMPRESSED_MAGICS.items():
        if payload[: len(magic)] == magic:
            raise NotImplementedError(
                f"{name} decode requires a codec library not present in "
                "this environment (the BMP/WAV paths are real)"
            )
    if payload[:2] == b"BM":
        return ("bmp",) + _decode_bmp(payload)
    if payload[:4] == b"RIFF":
        return ("wav",) + _decode_wav(payload)
    raise ValueError("unknown media format")


MEDIA_SCHEMA = (
    "doc_id bigint, img_w int, img_h int, mean_r double, mean_g double, "
    "mean_b double, wav_n int, wav_sr int, wav_rms double"
)


def media_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode real BMP + WAV payloads per document, ship them as binary
    columns through an Arrow batch boundary, decode with the
    independent parsers, and emit per-doc features.  The DuckDB oracle
    recomputes every feature from the generating arithmetic — the
    byte formats never leave Spark, so a hash-match proves the
    encoder and decoder agree on the real layouts."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n_parts = spark.sparkContext.defaultParallelism
    flat = docs.repartition(n_parts)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                bmp = decode_media(_encode_bmp(doc_id))
                wav = decode_media(_encode_wav(doc_id))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "img_w": bmp[1], "img_h": bmp[2],
                        "mean_r": round(bmp[3], 6),
                        "mean_g": round(bmp[4], 6),
                        "mean_b": round(bmp[5], 6),
                        "wav_n": wav[1], "wav_sr": wav[2],
                        "wav_rms": round(wav[3], 4),
                    }
                )
            yield pd.DataFrame(rows)

    return flat.mapInPandas(run, schema=MEDIA_SCHEMA).orderBy("doc_id")


MEDIA_ROUNDTRIP_SQL = """
WITH px AS (
  SELECT d.doc_id, x.x, y.y,
         d.doc_id % 16 + 4 AS w, d.doc_id % 8 + 2 AS h
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(0, d.doc_id % 16 + 3)) AS x) x,
       LATERAL (SELECT unnest(generate_series(0, d.doc_id % 8 + 1)) AS y) y
), img AS (
  SELECT doc_id,
         CAST(max(w) AS INT) AS img_w, CAST(max(h) AS INT) AS img_h,
         round(avg((doc_id + x + y) % 256), 6) AS mean_r,
         round(avg((doc_id * 2 + x) % 256), 6) AS mean_g,
         round(avg((doc_id * 3 + y) % 256), 6) AS mean_b
  FROM px GROUP BY doc_id
), smp AS (
  SELECT d.doc_id, i.i
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(0, d.doc_id % 100 + 49)) AS i) i
), wav AS (
  SELECT doc_id,
         CAST(count(*) AS INT) AS wav_n,
         CAST(8000 + (doc_id % 3) * 4000 AS INT) AS wav_sr,
         round(sqrt(avg(pow((doc_id * 31 + i * 17) % 65536 - 32768, 2))), 4)
           AS wav_rms
  FROM smp GROUP BY doc_id
)
SELECT img.doc_id, img_w, img_h, mean_r, mean_g, mean_b,
       wav_n, wav_sr, wav_rms
FROM img JOIN wav ON img.doc_id = wav.doc_id
ORDER BY img.doc_id
"""


QUERIES = {
    "multimodal_decode_features": multimodal_features,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_media_roundtrip": media_roundtrip,
}

ORACLE = {
    "multimodal_media_roundtrip": MEDIA_ROUNDTRIP_SQL,
    "multimodal_decode_features": MULTIMODAL_SQL,
    "multimodal_resize": MULTIMODAL_RESIZE_SQL,
    "multimodal_frame_sample": MULTIMODAL_FRAMES_SQL,
}
