"""Presto wire-format SetDigest (type/setdigest/SetDigest.java).

The reference's SetDigest type is a varbinary combining an airlift
HyperLogLog (2048 buckets) with a bottom-k MinHash table of
murmur3-hash64 values and their saturating 16-bit counts.  Layout
(SetDigest.java:105-126, little-endian):

    byte  1                      # UNCOMPRESSED_FORMAT
    int   hllLength
    bytes hll                    # airlift HLL (functions/presto_hll.py)
    int   maxHashes              # 8192 default (SetDigest.java:54)
    int   minhashLength
    long[minhashLength]  keys    # ascending SIGNED order (RBTree)
    short[minhashLength] counts

Semantics implemented exactly as the reference:

- bottom-k keeps the maxHashes SMALLEST hashes by signed long order
  (addHash removes lastLongKey — the largest — SetDigest.java:198-206);
- counts saturate at Short.MAX_VALUE on add and merge
  (Shorts.saturatedCast, SetDigest.java:216);
- cardinality() = exact table size while size < maxHashes, else the
  HLL estimate (SetDigest.java:150-157);
- jaccard_index walks the first min(|A|,|B|) keys of the signed-sorted
  union and counts two-sided membership (SetDigest.java:166-184);
- intersection_cardinality is exact set intersection in the exact
  regime, estimate*union-cardinality clamped otherwise
  (SetDigestFunctions.java:52-74).

Scale design mirrors presto_hll_spark: one Arrow pass computes
(hash, sparse-HLL-entry) per row; JVM partial aggregation reduces to
per-(group,hash) counts; a window group-limit (per-group heap) takes
the bottom-k; only <= k rows and <= 2^26 HLL entries per group reach
the Python packers.
"""

from __future__ import annotations

import functools
import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from facebook_presto_spark.functions import presto_hll as hll
from facebook_presto_spark.functions.registry import register

NUMBER_OF_BUCKETS = 2048  # SetDigest.java:53
DEFAULT_MAX_HASHES = 8192  # SetDigest.java:54
SHORT_MAX = 32767


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# ---------------------------------------------------------------------------
# codec

def serialize_setdigest(hll_bytes: bytes, keys: np.ndarray,
                        counts: np.ndarray, max_hashes: int) -> bytes:
    order = np.argsort(keys)  # signed ascending, like the RBTree
    keys = keys[order]
    counts = np.minimum(counts[order], SHORT_MAX)
    return (
        struct.pack("<Bi", 1, len(hll_bytes))
        + hll_bytes
        + struct.pack("<ii", max_hashes, len(keys))
        + keys.astype("<i8").tobytes()
        + counts.astype("<i2").tobytes()
    )


def deserialize_setdigest(data: bytes):
    """-> (PrestoHll, keys int64[], counts int16[], max_hashes)."""
    fmt, hll_len = struct.unpack_from("<Bi", data, 0)
    if fmt != 1:
        raise ValueError(f"Unexpected SetDigest version {fmt}")
    off = 5
    sketch = hll.PrestoHll.deserialize(data[off:off + hll_len])
    off += hll_len
    max_hashes, n = struct.unpack_from("<ii", data, off)
    off += 8
    keys = np.frombuffer(data, dtype="<i8", count=n, offset=off)
    off += 8 * n
    counts = np.frombuffer(data, dtype="<i2", count=n, offset=off)
    return sketch, keys, counts, max_hashes


def _digest_cardinality(data: bytes) -> int:
    sketch, keys, _, max_hashes = deserialize_setdigest(bytes(data))
    if len(keys) < max_hashes:  # isExact(): strict, SetDigest.java:147
        return len(keys)
    return sketch.cardinality()


def _merge_digests(raws) -> bytes | None:
    merged_hll = None
    table: dict[int, int] = {}
    max_hashes = DEFAULT_MAX_HASHES
    seen = False
    for raw in raws:
        if raw is None:
            continue
        seen = True
        sk, keys, counts, max_hashes = deserialize_setdigest(bytes(raw))
        merged_hll = sk if merged_hll is None else merged_hll.merge(sk)
        for k, c in zip(keys.tolist(), counts.tolist()):
            table[k] = min(table.get(k, 0) + c, SHORT_MAX)
    if not seen:
        return None
    keys = np.fromiter(table.keys(), dtype=np.int64, count=len(table))
    counts = np.fromiter(table.values(), dtype=np.int64, count=len(table))
    order = np.argsort(keys)
    keys, counts = keys[order][:max_hashes], counts[order][:max_hashes]
    return serialize_setdigest(merged_hll.serialize(), keys, counts, max_hashes)


def _jaccard(a: bytes, b: bytes) -> float:
    _, ka, _, _ = deserialize_setdigest(bytes(a))
    _, kb, _, _ = deserialize_setdigest(bytes(b))
    smaller = min(len(ka), len(kb))
    if smaller == 0:
        return float("nan")  # 0/0 in the reference's double division
    union = np.union1d(ka, kb)[:smaller]  # signed-sorted, first |smaller|
    inter = np.intersect1d(union, np.intersect1d(ka, kb))
    return len(inter) / float(smaller)


def _intersection_cardinality(a: bytes, b: bytes) -> int:
    """SetDigestFunctions.java:52-74: exact while both exact, else
    jaccard x union-cardinality clamped by the smaller cardinality."""
    sa, ka, _, ma = deserialize_setdigest(bytes(a))
    sb, kb, _, mb = deserialize_setdigest(bytes(b))
    if len(ka) < ma and len(kb) < mb:
        return len(np.intersect1d(ka, kb))
    union_card = sa.merge(sb).cardinality()
    est = round(_jaccard(a, b) * union_card)
    return int(min(est, _digest_cardinality(a), _digest_cardinality(b)))


# ---------------------------------------------------------------------------
# Spark plan

@functools.lru_cache(maxsize=1)
def _hash_entry_udf():
    """value -> struct(hash signed murmur3-64, HLL sparse entry)."""

    @F.pandas_udf("struct<h: long, e: long>")
    def hash_entry(vals: pd.Series) -> pd.DataFrame:
        if len(vals) == 0:
            return pd.DataFrame({"h": pd.Series([], dtype="Int64"),
                                 "e": pd.Series([], dtype="Int64")})
        kind = vals.dtype.kind
        kind = "i" if kind in ("i", "u") else ("f" if kind == "f" else "o")
        hashes, null_mask = hll.hash_series_murmur(vals, kind)
        b26, v = hll.buckets_values(hashes, hll.SPARSE_PREFIX_BITS)
        v = np.minimum(v, hll.SPARSE_VALUE_MASK)
        out = pd.DataFrame({
            "h": pd.Series(hashes.view(np.int64), dtype="Int64",
                           index=vals.index),
            "e": pd.Series(b26 * 64 + v, dtype="Int64", index=vals.index),
        })
        out.loc[null_mask, ["h", "e"]] = None
        return out

    return hash_entry


@functools.lru_cache(maxsize=8)
def _pack_minhash_udf(max_hashes: int):
    @F.pandas_udf("binary")
    def pack_minhash(pairs: pd.Series) -> bytes:
        # pairs: struct(h, cnt) rows, already bottom-k'd JVM-side
        keys = np.array([p["h"] for p in pairs], dtype=np.int64)
        counts = np.array([p["cnt"] for p in pairs], dtype=np.int64)
        order = np.argsort(keys)
        keys = keys[order][:max_hashes]
        counts = np.minimum(counts[order][:max_hashes], SHORT_MAX)
        return (
            struct.pack("<ii", max_hashes, len(keys))
            + keys.astype("<i8").tobytes()
            + counts.astype("<i2").tobytes()
        )

    return pack_minhash


@functools.lru_cache(maxsize=8)
def _pack_hll_udf(p: int):
    @F.pandas_udf("binary")
    def pack_hll(entries: pd.Series) -> bytes:
        arr = entries.dropna().to_numpy(dtype=np.int64).astype(np.uint32)
        arr = np.sort(arr)
        if len(arr) > (1 << p) // 8:
            return hll.PrestoHll(
                p, registers=hll.dense_registers_from_sparse(arr, p)
            ).serialize()
        return hll.PrestoHll(p, entries=arr).serialize()

    return pack_hll


@functools.lru_cache(maxsize=1)
def _combine_udf():
    @F.pandas_udf("binary")
    def combine(hll_bytes: pd.Series, minhash_bytes: pd.Series) -> pd.Series:
        out = []
        for hb, mb in zip(hll_bytes, minhash_bytes):
            if hb is None or mb is None:
                out.append(None)
                continue
            out.append(struct.pack("<Bi", 1, len(hb)) + bytes(hb) + bytes(mb))
        return pd.Series(out)

    return combine


def make_set_digest_agg(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    max_hashes: int = DEFAULT_MAX_HASHES,
) -> DataFrame:
    """make_set_digest(col) GROUP BY group_cols -> wire-format digest.

    Three bounded stages (see module docstring): per-row hash+entry,
    JVM (group, hash) counting + bottom-k window heap + (group,
    hll-bucket) max, then two pack UDFs and a byte-level combine.
    """
    p = hll.index_bit_length(NUMBER_OF_BUCKETS)
    # NULLs drop JVM-side (isNotNull is true for NaN): a NaN double
    # reaching the hasher is a real value — see hash_series_murmur
    he = df.where(_c(col).isNotNull()).select(
        *group_cols, _hash_entry_udf()(_c(col)).alias("__he")
    ).select(
        *group_cols, F.col("__he.h").alias("__h"), F.col("__he.e").alias("__e")
    ).where(F.col("__h").isNotNull())

    # (group, hash) -> saturating count; carries the HLL entry along
    # (it is a function of the hash, so first() is exact)
    per_hash = he.groupBy(*group_cols, "__h").agg(
        F.least(F.count(F.lit(1)), F.lit(SHORT_MAX)).alias("__cnt"),
        F.first("__e").alias("__e"),
    )

    # bottom-k smallest hashes per group (signed order, like the RBTree);
    # InferWindowGroupLimit turns the filter into a per-group heap
    w = Window.partitionBy(*group_cols).orderBy(F.col("__h").asc())
    bottomk = (
        per_hash.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_hashes)
        .groupBy(*group_cols)
        .agg(
            _pack_minhash_udf(max_hashes)(
                F.struct(F.col("__h").alias("h"), F.col("__cnt").alias("cnt"))
            ).alias("__minhash")
        )
    )

    # HLL over ALL distinct hashes (not just the bottom-k)
    hll_part = (
        per_hash.groupBy(*group_cols, F.shiftright("__e", 6).alias("__b"))
        .agg(F.max(F.col("__e").bitwiseAND(F.lit(63))).alias("__v"))
        .groupBy(*group_cols)
        .agg(_pack_hll_udf(p)(F.col("__b") * 64 + F.col("__v")).alias("__hll"))
    )

    return bottomk.join(hll_part, group_cols).select(
        *group_cols,
        _combine_udf()(F.col("__hll"), F.col("__minhash")).alias("digest"),
    )


@functools.lru_cache(maxsize=1)
def _merge_udf():
    @F.pandas_udf("binary")
    def merge_digests(digests: pd.Series) -> bytes:
        return _merge_digests(digests)

    return merge_digests


def merge_set_digest_agg(c) -> Column:
    """merge_set_digest(digest) — MergeSetDigestAggregation.java."""
    return _merge_udf()(_c(c))


@functools.lru_cache(maxsize=1)
def _cardinality_udf():
    @F.pandas_udf("long")
    def digest_cardinality(digests: pd.Series) -> pd.Series:
        return pd.Series(
            [None if d is None else _digest_cardinality(d) for d in digests],
            dtype="Int64",
        )

    return digest_cardinality


def cardinality_setdigest_wire(c) -> Column:
    """cardinality(setdigest) — SetDigestFunctions.java:47."""
    return _cardinality_udf()(_c(c))


@functools.lru_cache(maxsize=1)
def _jaccard_udf():
    @F.pandas_udf("double")
    def jaccard(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if (x is None or y is None) else _jaccard(x, y)
                for x, y in zip(a, b)
            ],
            dtype="float64",
        )

    return jaccard


def jaccard_index_wire(a, b) -> Column:
    """jaccard_index(d1, d2) — SetDigestFunctions.java:77-84."""
    return _jaccard_udf()(_c(a), _c(b))


@functools.lru_cache(maxsize=1)
def _intersection_udf():
    @F.pandas_udf("long")
    def intersection(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if (x is None or y is None)
                else _intersection_cardinality(x, y)
                for x, y in zip(a, b)
            ],
            dtype="Int64",
        )

    return intersection


def intersection_cardinality_wire(a, b) -> Column:
    """intersection_cardinality(d1, d2) — SetDigestFunctions.java:52."""
    return _intersection_udf()(_c(a), _c(b))


@functools.lru_cache(maxsize=1)
def _hash_counts_udf():
    @F.pandas_udf("map<long, int>")
    def hash_counts(digests: pd.Series) -> pd.Series:
        out = []
        for d in digests:
            if d is None:
                out.append(None)
                continue
            _, keys, counts, _ = deserialize_setdigest(bytes(d))
            out.append(dict(zip(keys.tolist(), counts.tolist())))
        return pd.Series(out)

    return hash_counts


def hash_counts_wire(c) -> Column:
    """hash_counts(setdigest) -> map<bigint,smallint> —
    SetDigestFunctions.java:87 (smallint widened to int for Arrow)."""
    return _hash_counts_udf()(_c(c))


register("make_set_digest_wire")(make_set_digest_agg)
register("merge_set_digest_wire")(merge_set_digest_agg)
register("cardinality_setdigest_wire")(cardinality_setdigest_wire)
register("jaccard_index_wire")(jaccard_index_wire)
register("intersection_cardinality_wire")(intersection_cardinality_wire)
register("hash_counts_wire")(hash_counts_wire)
