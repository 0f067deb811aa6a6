"""Spark plans and UDFs over the Presto/airlift HyperLogLog wire format.

The reference surface (all return/consume the HYPER_LOG_LOG varbinary —
spi/type/HyperLogLogType.java):

- ``approx_set(x)``          aggregate -> HLL sketch
  (operator/aggregation/ApproximateSetAggregation.java, 4096 buckets)
- ``merge(hll)``             aggregate -> HLL sketch
  (operator/aggregation/MergeHyperLogLogAggregation.java)
- ``cardinality(hll)``       scalar    -> bigint
  (operator/scalar/HyperLogLogFunctions.java:31)
- ``empty_approx_set()``     scalar    -> empty sketch
  (operator/scalar/HyperLogLogFunctions.java:39)
- ``approx_distinct(x[,e])`` aggregate -> bigint, xxHash64 pre-hash
  (operator/aggregation/ApproximateCountDistinctAggregation.java)

Scale design (the 100 TB shape)
-------------------------------
``approx_set_agg`` never ships raw rows to Python and never holds a
group in memory:

1. one Arrow-batched scalar pandas UDF turns each value into a 32-bit
   sparse entry (top 26 hash bits + 6-bit leading-zero count) — a
   per-row map, no state;
2. ``groupBy(keys, entry >> 6).max(entry & 63)`` runs JVM-side with
   partial aggregation, so the shuffle carries at most
   min(distinct values, 2^26) rows per group, already combined
   map-side;
3. a grouped-agg pandas UDF packs each group's (<= 2^26, in practice
   <= cardinality) pre-aggregated entries into the airlift
   SPARSE_V2/DENSE_V2 bytes.

``merge_hll_agg`` / ``cardinality_hll`` operate on the (tiny) sketches
themselves — one ~2KB value per group — so a plain grouped-agg /
scalar pandas UDF is already the right plan at any scale.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from facebook_presto_spark.functions import presto_hll as hll
from facebook_presto_spark.functions.registry import register


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _series_kind(values: pd.Series) -> str:
    k = values.dtype.kind
    if k in ("i", "u"):
        return "i"
    if k == "f":
        return "f"
    return "o"


@functools.lru_cache(maxsize=4)
def _sparse_entry_udf(hash_fn: str):
    """Scalar pandas UDF: value -> 32-bit sparse entry (null-safe)."""

    hasher = (
        hll.hash_series_murmur if hash_fn == "murmur" else hll.hash_series_xxhash
    )

    @F.pandas_udf("long")
    def entry(vals: pd.Series) -> pd.Series:
        if len(vals) == 0:
            return pd.Series([], dtype="Int64")
        hashes, null_mask = hasher(vals, _series_kind(vals))
        b26, v = hll.buckets_values(hashes, hll.SPARSE_PREFIX_BITS)
        v = np.minimum(v, hll.SPARSE_VALUE_MASK)
        packed = b26 * 64 + v
        out = pd.Series(packed, dtype="Int64", index=vals.index)
        out[null_mask] = None
        return out

    return entry


@functools.lru_cache(maxsize=8)
def _pack_udf(p: int):
    """Grouped-agg pandas UDF: pre-aggregated sparse entries -> sketch."""

    @F.pandas_udf("binary")
    def pack(entries: pd.Series) -> bytes:
        arr = entries.dropna().to_numpy(dtype=np.int64).astype(np.uint32)
        if len(arr) == 0:
            return hll.PrestoHll(p, entries=np.array([], dtype=np.uint32)).serialize()
        arr = np.sort(arr)
        if len(arr) > (1 << p) // 8:
            regs = hll.dense_registers_from_sparse(arr, p)
            return hll.PrestoHll(p, registers=regs).serialize()
        return hll.PrestoHll(p, entries=arr).serialize()

    return pack


def sparse_entry(c, hash_fn: str = "murmur") -> Column:
    """Per-row 26-bit-prefix sparse entry of a value's hash (the map
    stage of the distributed approx_set plan)."""
    return _sparse_entry_udf(hash_fn)(_c(c))


def approx_set_agg(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    buckets: int = hll.DEFAULT_APPROX_SET_BUCKETS,
    hash_fn: str = "murmur",
) -> DataFrame:
    """approx_set(col) GROUP BY group_cols -> Presto-wire HLL per group.

    ApproximateSetAggregation.java:30-41 semantics: murmur3 hash64,
    4096 buckets, NULLs ignored.  See module docstring for the
    three-stage 100 TB plan.
    """
    p = hll.index_bit_length(buckets)
    # NULLs drop JVM-side BEFORE the Arrow transfer: isNotNull is true
    # for NaN doubles, so a NaN reaching the hasher is a real value
    # (Presto counts NaN; hash_series_murmur docstring has the contract)
    entries = df.where(F.col(col).isNotNull()).select(
        *group_cols, sparse_entry(col, hash_fn).alias("__entry")
    ).where(F.col("__entry").isNotNull())
    pre = entries.groupBy(
        *group_cols, F.shiftright("__entry", hll.SPARSE_VALUE_BITS).alias("__b")
    ).agg(F.max(F.col("__entry").bitwiseAND(F.lit(63))).alias("__v"))
    return pre.groupBy(*group_cols).agg(
        _pack_udf(p)(F.col("__b") * 64 + F.col("__v")).alias("hll")
    )


def approx_distinct_agg(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    max_standard_error: float = hll.DEFAULT_APPROX_DISTINCT_ERROR,
) -> DataFrame:
    """approx_distinct(col[, e]) GROUP BY group_cols — reference-exact.

    The estimate a real cluster returns for the same input: xxHash64
    pre-hash (ApproximateCountDistinctAggregation.java:63), bucket
    count from the standard error, airlift estimator.  Same distributed
    plan as approx_set_agg + a cardinality map at the end.
    """
    buckets = hll.buckets_for_standard_error(max_standard_error)
    sketches = approx_set_agg(
        df, group_cols, col, buckets=buckets, hash_fn="xxhash"
    )
    return sketches.select(
        *group_cols, cardinality_hll(F.col("hll")).alias("approx_distinct")
    )


@functools.lru_cache(maxsize=1)
def _merge_udf():
    @F.pandas_udf("binary")
    def merge_sketches(sketches: pd.Series) -> bytes:
        merged = None
        for raw in sketches:
            if raw is None:
                continue
            sk = hll.PrestoHll.deserialize(bytes(raw))
            merged = sk if merged is None else merged.merge(sk)
        return None if merged is None else merged.serialize()

    return merge_sketches


def merge_hll_agg(c) -> Column:
    """merge(HyperLogLog) aggregate — MergeHyperLogLogAggregation.java.

    Column-expression form: one sketch per input row, so the grouped
    Arrow transfer moves ~2KB per row regardless of original data size.
    """
    return _merge_udf()(_c(c))


@functools.lru_cache(maxsize=1)
def _cardinality_udf():
    @F.pandas_udf("long")
    def sketch_cardinality(sketches: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if raw is None
                else hll.PrestoHll.deserialize(bytes(raw)).cardinality()
                for raw in sketches
            ],
            dtype="Int64",
        )

    return sketch_cardinality


def cardinality_hll(c) -> Column:
    """cardinality(HyperLogLog) — HyperLogLogFunctions.java:31."""
    return _cardinality_udf()(_c(c))


@functools.lru_cache(maxsize=1)
def _to_p4_udf():
    @F.pandas_udf("binary")
    def to_p4(sketches: pd.Series) -> pd.Series:
        out = []
        for raw in sketches:
            if raw is None:
                out.append(None)
                continue
            sk = hll.PrestoHll.deserialize(bytes(raw))
            out.append(
                hll.PrestoHll(
                    sk.p, registers=sk.to_dense_registers()
                ).serialize()
            )
        return pd.Series(out)

    return to_p4


def cast_to_p4_hll(c) -> Column:
    """CAST(hll AS P4HyperLogLog) — HyperLogLogOperators.castToP4Hll
    (makeDense + reserialize; the P4 type is the dense-only wire form).
    The reverse cast is the identity (castFromP4Hll)."""
    return _to_p4_udf()(_c(c))


def empty_approx_set() -> bytes:
    """empty_approx_set() — HyperLogLogFunctions.java:39 (an empty
    SPARSE_V2 sketch at approx_set's 4096-bucket precision)."""
    p = hll.index_bit_length(hll.DEFAULT_APPROX_SET_BUCKETS)
    return hll.PrestoHll(p, entries=np.array([], dtype=np.uint32)).serialize()


register("approx_set_wire")(approx_set_agg)
register("merge_hll_wire")(merge_hll_agg)
register("cardinality_hll_wire")(cardinality_hll)
register("approx_distinct_wire")(approx_distinct_agg)
register("cast_to_p4_hll")(cast_to_p4_hll)
