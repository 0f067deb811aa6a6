"""Presto/airlift wire-format HyperLogLog codec.

The reference's HYPER_LOG_LOG type (spi/type/HyperLogLogType.java) is a
varbinary carrying an ``io.airlift.stats.cardinality.HyperLogLog``
serialization.  This module implements that wire format so sketches
cross the boundary in BOTH directions: sketches produced here are
readable by a real Presto cluster's ``cardinality()`` / ``merge()``,
and sketches exported from a Presto cluster can be merged/estimated
here.  Everything derives from public sources: the airlift ``stats``
library (Apache-2.0, io.airlift.stats.cardinality) defines the byte
layout, and the estimator's bias tables are the published HLL++ paper
appendix data (see ``_hllpp_tables.py``).

Wire format (airlift Format tags; little-endian throughout)
-----------------------------------------------------------
``SPARSE_V2`` (tag 2)::

    byte  tag = 2
    byte  indexBitLength            # p, the *dense* precision
    short numberOfEntries
    int32[numberOfEntries] entries  # sorted unsigned-ascending

Each sparse entry packs the top 26 bits of the 64-bit hash and a 6-bit
"number of leading zeros + 1" computed over ``hash << 26``:
``entry = (hash >>> 38) << 6 | value``.  Holding a 26-bit prefix (not
just the p-bit bucket) lets the sparse form densify to ANY p <= 26
without re-reading input.

``DENSE_V2`` (tag 3)::

    byte  tag = 3
    byte  indexBitLength                 # p
    byte  baseline
    byte[2^p / 2] deltas                 # two 4-bit deltas per byte;
                                         # even bucket = HIGH nibble
    short overflowEntries
    short[overflowEntries] overflowBuckets
    byte [overflowEntries] overflowValues

Bucket value = baseline + delta, and where delta saturates at 15 the
overflow entry holds the excess: value = baseline + 15 + overflow.

Hashing (what a real cluster computes)
--------------------------------------
- ``approx_set`` inserts ``Murmur3Hash128.hash64(value)`` — the first
  64 bits of canonical MurmurHash3 x64_128 (Appleby, public domain)
  over the 8-byte little-endian long / the raw UTF-8 bytes
  (ApproximateSetAggregation.java:44-69; doubles go through
  doubleToLongBits first).
- ``approx_distinct`` pre-hashes with the type's XX_HASH_64 operator —
  seed-0 xxHash64 (Collet, public spec) of the same encoding
  (ApproximateCountDistinctAggregation.java:63, BigintOperators.java:322).

Both hashes are implemented twice: a vectorized numpy uint64 path for
the 8-byte-long hot loop (Arrow batches from pandas UDFs), and a
scalar bytes path for varchar.  Golden vectors in
tests/test_presto_hll.py are generated from independent JVM
implementations (Guava murmur3_128, Spark XXH64) via py4j.

Estimator
---------
Follows airlift DenseHll.cardinality(): linear counting while >40% of
buckets are empty, otherwise alpha*m^2 / sum(2^-reg) with the HLL++
bias-table interpolation.  SparseHll estimates by linear counting over
the 2^26 virtual buckets.  Format compatibility is exact by
construction; the estimator is airlift's published algorithm (verified
here for accuracy bounds — a live cluster for bit-level comparison is
not available in this environment).

Scale design: none of this runs row-at-a-time on the driver.  The
aggregation plan (agg_fns.approx_set_presto) computes (bucket, value)
JVM-side-groupable pairs in ONE Arrow-batched pass, pre-aggregates
``max(value) per (group, bucket)`` with Spark's partial aggregation
(so at most 2^p rows per group cross the shuffle), and only the final
<=2^p-row bucket list per group meets Python again to be packed into
the wire format.
"""

from __future__ import annotations

import struct

import numpy as np

from facebook_presto_spark.functions._hllpp_tables import (
    BIAS_DATA,
    RAW_ESTIMATE_DATA,
)

TAG_SPARSE_V2 = 2
TAG_DENSE_V2 = 3

SPARSE_PREFIX_BITS = 26  # airlift SparseHll: 32-bit entry minus VALUE_BITS
SPARSE_VALUE_BITS = 6
SPARSE_VALUE_MASK = (1 << SPARSE_VALUE_BITS) - 1

# airlift DenseHll.LINEAR_COUNTING_MIN_EMPTY_BUCKETS
LINEAR_COUNTING_MIN_EMPTY_BUCKETS = 0.4

DEFAULT_APPROX_SET_BUCKETS = 4096  # ApproximateSetAggregation.java:34
DEFAULT_APPROX_DISTINCT_ERROR = 0.023  # DefaultApproximateCountDistinct...:39

_U64 = np.uint64


# ---------------------------------------------------------------------------
# MurmurHash3 x64_128 — first 64 bits (airlift Murmur3Hash128.hash64)

_MM_C1 = _U64(0x87C37B91114253D5)
_MM_C2 = _U64(0x4CF5AD432745937F)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = _U64(r)
    return (x << r) | (x >> (_U64(64) - r))


def _fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _U64(33))
    k = k * _U64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> _U64(33))
    k = k * _U64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> _U64(33))
    return k


def murmur3_hash64_longs(values: np.ndarray) -> np.ndarray:
    """Vectorized hash64 of int64 values (8-byte LE block, seed 0).

    Eight bytes are a single tail block of the canonical x64_128:
    k1 = value; k1 *= c1; k1 = rotl(k1,31); k1 *= c2; h1 ^= k1; then
    finalization with total length 8.
    """
    with np.errstate(over="ignore"):
        k1 = values.astype(np.int64).view(_U64).copy()
        k1 = k1 * _MM_C1
        k1 = _rotl(k1, 31)
        k1 = k1 * _MM_C2
        h1 = k1.copy()  # h1 = seed(0) ^ k1
        h2 = np.zeros_like(h1)
        ln = _U64(8)
        h1 = h1 ^ ln
        h2 = h2 ^ ln
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _fmix64(h1)
        h2 = _fmix64(h2)
        h1 = h1 + h2
        return h1


def murmur3_hash64_bytes(data: bytes) -> int:
    """Scalar hash64 of a byte string (canonical x64_128, first 64 bits)."""
    h1 = h2 = 0
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    mask = (1 << 64) - 1

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & mask

    def fmix(k: int) -> int:
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & mask
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & mask
        k ^= k >> 33
        return k

    n_blocks = len(data) // 16
    for i in range(n_blocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = rotl((k1 * c1) & mask, 31)
        k1 = (k1 * c2) & mask
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & mask
        h1 = (h1 * 5 + 0x52DCE729) & mask
        k2 = rotl((k2 * c2) & mask, 33)
        k2 = (k2 * c1) & mask
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & mask
        h2 = (h2 * 5 + 0x38495AB5) & mask

    tail = data[n_blocks * 16:]
    k1 = k2 = 0
    for i in range(len(tail) - 1, 7, -1):  # bytes 8..15 -> k2
        k2 = (k2 << 8) | tail[i]
    for i in range(min(len(tail), 8) - 1, -1, -1):  # bytes 0..7 -> k1
        k1 = (k1 << 8) | tail[i]
    if len(tail) > 8:
        k2 = rotl((k2 * c2) & mask, 33)
        k2 = (k2 * c1) & mask
        h2 ^= k2
    if len(tail) > 0:
        k1 = rotl((k1 * c1) & mask, 31)
        k1 = (k1 * c2) & mask
        h1 ^= k1

    h1 ^= len(data)
    h2 ^= len(data)
    h1 = (h1 + h2) & mask
    h2 = (h2 + h1) & mask
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & mask
    return h1


# ---------------------------------------------------------------------------
# xxHash64, seed 0 (airlift XxHash64 — approx_distinct's pre-hash)

_XX_P1 = _U64(0x9E3779B185EBCA87)
_XX_P2 = _U64(0xC2B2AE3D27D4EB4F)
_XX_P3 = _U64(0x165667B19E3779F9)
_XX_P4 = _U64(0x85EBCA77C2B2AE63)
_XX_P5 = _U64(0x27D4EB2F165667C5)


def xxhash64_longs(values: np.ndarray) -> np.ndarray:
    """Vectorized seed-0 xxHash64 of int64 values (8-byte LE input)."""
    with np.errstate(over="ignore"):
        acc = _XX_P5 + _U64(8)  # seed + PRIME5, + input length
        k1 = values.astype(np.int64).view(_U64).copy()
        k1 = _rotl(k1 * _XX_P2, 31) * _XX_P1
        h = np.full(len(values), acc, dtype=_U64)
        h = h ^ k1
        h = _rotl(h, 27) * _XX_P1 + _XX_P4
        h = h ^ (h >> _U64(33))
        h = h * _XX_P2
        h = h ^ (h >> _U64(29))
        h = h * _XX_P3
        h = h ^ (h >> _U64(32))
        return h


def xxhash64_bytes(data: bytes, seed: int = 0) -> int:
    """Scalar xxHash64 (full-length algorithm, any size; seed 0 is the
    reference's XX_HASH_64 operator; other seeds exist for tests)."""
    mask = (1 << 64) - 1
    p1, p2, p3, p4, p5 = (
        0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
        0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
    )

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & mask

    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + p1 + p2) & mask
        v2 = (seed + p2) & mask
        v3 = seed & mask
        v4 = (seed - p1) & mask
        while pos + 32 <= n:
            a, b, c, d = struct.unpack_from("<QQQQ", data, pos)
            v1 = (rotl((v1 + a * p2) & mask, 31) * p1) & mask
            v2 = (rotl((v2 + b * p2) & mask, 31) * p1) & mask
            v3 = (rotl((v3 + c * p2) & mask, 31) * p1) & mask
            v4 = (rotl((v4 + d * p2) & mask, 31) * p1) & mask
            pos += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & mask
        for v in (v1, v2, v3, v4):
            h ^= (rotl((v * p2) & mask, 31) * p1) & mask
            h = ((h * p1) + p4) & mask
    else:
        h = (seed + p5) & mask
    h = (h + n) & mask
    while pos + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, pos)
        h ^= (rotl((k * p2) & mask, 31) * p1) & mask
        h = (rotl(h, 27) * p1 + p4) & mask
        pos += 8
    if pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h ^= (k * p1) & mask
        h = (rotl(h, 23) * p2 + p3) & mask
        pos += 4
    while pos < n:
        h ^= (data[pos] * p5) & mask
        h = (rotl(h, 11) * p1) & mask
        pos += 1
    h ^= h >> 33
    h = (h * p2) & mask
    h ^= h >> 29
    h = (h * p3) & mask
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# bucket/value decomposition

def buckets_values(hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, value) per hash: bucket = top p bits; value = number of
    leading zeros of ``hash << p`` plus one (airlift Utils.computeValue)."""
    h = hashes.astype(_U64, copy=False)
    bucket = (h >> _U64(64 - p)).astype(np.int64)
    shifted = (h << _U64(p)) & _U64(0xFFFFFFFFFFFFFFFF)
    # number of leading zeros of a 64-bit lane: 64 - bit_length
    # (np.uint64 has no bit_length; use the float64 exponent trick only
    # for verification — production path derives from integer compares)
    value = np.zeros(len(h), dtype=np.int64)
    nz = shifted != 0
    # log2 via successively halving compare masks (exact, integer-only)
    s = shifted[nz]
    bits = np.zeros(len(s), dtype=np.int64)
    for step in (32, 16, 8, 4, 2, 1):
        big = s >= (_U64(1) << _U64(step))
        bits[big] += step
        s = np.where(big, s >> _U64(step), s)
    value[nz] = 64 - (bits + 1) + 1  # nlz + 1
    value[~nz] = 64 - p + 1  # all remaining bits zero
    return bucket, value


def sparse_entries_from_hashes(hashes: np.ndarray) -> np.ndarray:
    """Distinct sorted SPARSE_V2 entries for a hash array."""
    b26, v = buckets_values(hashes, SPARSE_PREFIX_BITS)
    v = np.minimum(v, SPARSE_VALUE_MASK)
    entries = (b26.astype(np.uint32) << np.uint32(SPARSE_VALUE_BITS)) | v.astype(
        np.uint32
    )
    # one entry per 26-bit bucket, keeping the max value
    order = np.lexsort((-v, b26))
    entries = entries[order]
    b_sorted = b26[order]
    keep = np.concatenate(([True], b_sorted[1:] != b_sorted[:-1]))
    return np.sort(entries[keep])


def dense_registers_from_sparse(entries: np.ndarray, p: int) -> np.ndarray:
    """Densify sparse entries to 2^p registers (airlift SparseHll.toDense)."""
    if p > SPARSE_PREFIX_BITS:
        raise ValueError(f"indexBitLength {p} > {SPARSE_PREFIX_BITS}")
    e = entries.astype(np.uint32, copy=False)
    b26 = (e >> np.uint32(SPARSE_VALUE_BITS)).astype(np.int64)
    sv = (e & np.uint32(SPARSE_VALUE_MASK)).astype(np.int64)
    bucket = b26 >> (SPARSE_PREFIX_BITS - p)
    rem_bits = SPARSE_PREFIX_BITS - p
    rem = b26 & ((1 << rem_bits) - 1)
    # bits of the hash between p and 26 are non-zero -> value from them
    bl = np.zeros(len(e), dtype=np.int64)
    r = rem.copy()
    for step in (16, 8, 4, 2, 1):
        big = r >= (1 << step)
        bl[big] += step
        r = np.where(big, r >> step, r)
    bl = np.where(rem != 0, bl + 1, 0)  # bit length of rem
    value = np.where(rem != 0, rem_bits - bl + 1, rem_bits + sv)
    regs = np.zeros(1 << p, dtype=np.int64)
    np.maximum.at(regs, bucket, value)
    return regs


class PrestoHll:
    """An airlift HyperLogLog: dense registers or sparse entry list."""

    __slots__ = ("p", "registers", "entries")

    def __init__(self, p: int, registers: np.ndarray | None = None,
                 entries: np.ndarray | None = None):
        if (registers is None) == (entries is None):
            raise ValueError("exactly one of registers/entries")
        self.p = p
        self.registers = registers
        self.entries = entries

    @property
    def is_sparse(self) -> bool:
        return self.entries is not None

    def to_dense_registers(self) -> np.ndarray:
        if self.registers is not None:
            return self.registers
        return dense_registers_from_sparse(self.entries, self.p)

    # -- construction -----------------------------------------------------

    @classmethod
    def from_hashes(cls, hashes: np.ndarray,
                    buckets: int = DEFAULT_APPROX_SET_BUCKETS) -> "PrestoHll":
        p = index_bit_length(buckets)
        entries = sparse_entries_from_hashes(np.asarray(hashes))
        # airlift converts sparse->dense when the sparse form outgrows the
        # dense layout (HyperLogLog.makeDenseIfNecessary); 4-byte entries
        # vs 2^p half-byte registers -> threshold at 2^p / 8 entries
        if len(entries) > (1 << p) // 8:
            return cls(p, registers=dense_registers_from_sparse(entries, p))
        return cls(p, entries=entries)

    # -- serialization ----------------------------------------------------

    def serialize(self) -> bytes:
        if self.is_sparse:
            e = np.sort(self.entries.astype(np.uint32, copy=False))
            if len(e) > 0xFFFF:
                # the SPARSE_V2 count field is 16-bit; airlift densifies
                # long before this point (threshold 2^p/8 with p <= 17
                # through the public constructors), so reaching here
                # means a caller built an out-of-contract sparse sketch
                raise ValueError(
                    f"sparse HLL with {len(e)} entries exceeds the "
                    f"16-bit wire count; densify first"
                )
            return (
                struct.pack("<BBH", TAG_SPARSE_V2, self.p, len(e))
                + e.astype("<u4").tobytes()
            )
        regs = self.registers
        m = 1 << self.p
        baseline = int(regs.min())
        deltas = regs - baseline
        over = deltas > 15
        overflow_buckets = np.nonzero(over)[0]
        overflow_values = deltas[over] - 15
        if len(overflow_buckets) > (1 << 16) - 1:
            raise ValueError("overflow table too large")
        if len(overflow_buckets) and overflow_buckets.max() > 0xFFFF:
            # the wire overflow-bucket field is 16-bit; indexes past
            # 65535 (p >= 17 sketches) would silently wrap — refuse
            # loudly (overflows need a bucket 15 above baseline, which
            # at these precisions essentially never happens with real
            # hash input)
            raise ValueError(
                "overflow bucket index exceeds the 16-bit wire field"
            )
        deltas = np.minimum(deltas, 15).astype(np.uint8)
        packed = (deltas[0::2] << 4) | deltas[1::2]  # even bucket = high nibble
        return (
            struct.pack("<BBB", TAG_DENSE_V2, self.p, baseline)
            + packed.astype(np.uint8).tobytes()
            + struct.pack("<H", len(overflow_buckets))
            + overflow_buckets.astype("<u2").tobytes()
            + overflow_values.astype(np.uint8).tobytes()
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "PrestoHll":
        if len(data) < 2:
            raise ValueError("truncated HyperLogLog")
        tag = data[0]
        p = data[1]
        if tag == TAG_SPARSE_V2:
            (n,) = struct.unpack_from("<H", data, 2)
            entries = np.frombuffer(data, dtype="<u4", count=n, offset=4)
            return cls(p, entries=entries.astype(np.uint32))
        if tag == TAG_DENSE_V2:
            m = 1 << p
            baseline = data[2]
            packed = np.frombuffer(data, dtype=np.uint8, count=m // 2, offset=3)
            regs = np.empty(m, dtype=np.int64)
            regs[0::2] = packed >> 4
            regs[1::2] = packed & 0x0F
            off = 3 + m // 2
            (n_over,) = struct.unpack_from("<H", data, off)
            off += 2
            ob = np.frombuffer(data, dtype="<u2", count=n_over, offset=off)
            off += 2 * n_over
            ov = np.frombuffer(data, dtype=np.uint8, count=n_over, offset=off)
            # legacy writers may repeat a bucket: keep the max overflow
            regs += baseline
            if n_over:
                extra = np.zeros(m, dtype=np.int64)
                np.maximum.at(extra, ob.astype(np.int64), ov.astype(np.int64))
                regs += extra
            return cls(p, registers=regs)
        raise ValueError(
            f"unsupported HyperLogLog format tag {tag} (only V2 sparse/dense)"
        )

    # -- merge / estimate --------------------------------------------------

    def merge(self, other: "PrestoHll") -> "PrestoHll":
        if self.p != other.p:
            # airlift DenseHll.verifyCompatibility — the reference's
            # merge() raises on mismatched bucket counts
            raise ValueError(
                f"cannot merge HLLs with different indexBitLength: "
                f"{self.p} vs {other.p}"
            )
        if self.is_sparse and other.is_sparse:
            both = np.concatenate(
                [self.entries, other.entries]
            ).astype(np.uint32)
            if len(both) == 0:
                return PrestoHll(self.p, entries=both)
            b26 = (both >> np.uint32(SPARSE_VALUE_BITS)).astype(np.int64)
            v = (both & np.uint32(SPARSE_VALUE_MASK)).astype(np.int64)
            order = np.lexsort((-v, b26))
            both, bs = both[order], b26[order]
            keep = np.concatenate(([True], bs[1:] != bs[:-1]))
            entries = np.sort(both[keep])
            if len(entries) > (1 << self.p) // 8:
                return PrestoHll(
                    self.p,
                    registers=dense_registers_from_sparse(entries, self.p),
                )
            return PrestoHll(self.p, entries=entries)
        regs = np.maximum(self.to_dense_registers(), other.to_dense_registers())
        return PrestoHll(self.p, registers=regs)

    def cardinality(self) -> int:
        if self.is_sparse:
            total = 1 << SPARSE_PREFIX_BITS
            zeros = total - len(self.entries)
            return round(_linear_counting(zeros, total))
        regs = self.registers
        m = 1 << self.p
        if regs.min() == 0:
            zeros = int((regs == 0).sum())
            if zeros > LINEAR_COUNTING_MIN_EMPTY_BUCKETS * m:
                return round(_linear_counting(zeros, m))
        with np.errstate(over="ignore"):
            s = np.power(2.0, -regs.astype(np.float64)).sum()
        raw = _alpha(self.p) * m * m / s
        return round(_correct_bias(raw, self.p))


def index_bit_length(buckets: int) -> int:
    p = buckets.bit_length() - 1
    if (1 << p) != buckets:
        raise ValueError(f"buckets must be a power of 2: {buckets}")
    return p


def buckets_for_standard_error(max_standard_error: float) -> int:
    """ApproximateCountDistinctAggregation.standardErrorToBuckets."""
    if not (0.0040625 <= max_standard_error <= 0.26):
        raise ValueError(
            f"Max standard error must be in [0.0040625, 0.26]: "
            f"{max_standard_error}"
        )
    import math

    need = math.ceil(1.0816 / (max_standard_error * max_standard_error))
    return 1 << (need - 1).bit_length()


def _alpha(p: int) -> float:
    m = 1 << p
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _linear_counting(zero_buckets: int, total_buckets: int) -> float:
    import math

    return total_buckets * math.log(total_buckets / zero_buckets)


def _correct_bias(raw: float, p: int) -> float:
    """HLL++ empirical bias subtraction with linear interpolation
    (airlift DenseHll.correctBias over the published tables)."""
    estimates = RAW_ESTIMATE_DATA[p - 4]
    if raw < estimates[0] or raw > estimates[-1]:
        return raw
    import bisect

    biases = BIAS_DATA[p - 4]
    i = bisect.bisect_left(estimates, raw)
    if i < len(estimates) and estimates[i] == raw:
        return raw - biases[i]
    x0, x1 = estimates[i - 1], estimates[i]
    y0, y1 = biases[i - 1], biases[i]
    return raw - ((raw - x0) * (y1 - y0) / (x1 - x0) + y0)


# ---------------------------------------------------------------------------
# hash helpers for pandas batches

def hash_series_murmur(values, dtype_kind: str) -> np.ndarray:
    """Murmur3 hash64 of a pandas Series batch (approx_set semantics).

    Callers filter SQL NULLs JVM-side (``isNotNull`` is true for NaN)
    BEFORE the Arrow transfer: a float64 NaN reaching this function is
    therefore a genuine double NaN and hashes as Java's canonical NaN
    bits (Double.doubleToLongBits), never dropped — SQL NULL and NaN
    would otherwise be indistinguishable in a float64 batch.
    """
    import pandas as pd

    if dtype_kind == "i":  # bigint
        filled = values.fillna(0).to_numpy(dtype=np.int64)
        out = murmur3_hash64_longs(filled)
        mask = values.isna().to_numpy()
    elif dtype_kind == "f":  # double -> doubleToLongBits, NaN is a value
        arr = values.to_numpy(dtype=np.float64)
        out = murmur3_hash64_longs(_double_to_long_bits(arr))
        mask = np.zeros(len(values), dtype=bool)
    else:  # varchar/varbinary
        out = np.array(
            [
                0 if v is None else murmur3_hash64_bytes(
                    v if isinstance(v, bytes) else str(v).encode("utf-8")
                )
                for v in values
            ],
            dtype=_U64,
        )
        mask = np.array([v is None for v in values], dtype=bool)
    return out, mask


def hash_series_xxhash(values, dtype_kind: str) -> np.ndarray:
    """Seed-0 xxHash64 of a pandas Series batch (approx_distinct
    semantics).  Same NULL-vs-NaN contract as hash_series_murmur."""
    import pandas as pd

    if dtype_kind == "i":
        filled = values.fillna(0).to_numpy(dtype=np.int64)
        out = xxhash64_longs(filled)
        mask = values.isna().to_numpy()
    elif dtype_kind == "f":
        arr = values.to_numpy(dtype=np.float64)
        out = xxhash64_longs(_double_to_long_bits(arr))
        mask = np.zeros(len(values), dtype=bool)
    else:
        out = np.array(
            [
                0 if v is None else xxhash64_bytes(
                    v if isinstance(v, bytes) else str(v).encode("utf-8")
                )
                for v in values
            ],
            dtype=_U64,
        )
        mask = np.array([v is None for v in values], dtype=bool)
    return out, mask


def _double_to_long_bits(arr: np.ndarray) -> np.ndarray:
    """Java Double.doubleToLongBits: canonical NaN, raw bits otherwise."""
    bits = arr.view(np.int64).copy()
    bits[np.isnan(arr)] = 0x7FF8000000000000
    return bits
