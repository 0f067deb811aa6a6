"""Presto/airlift wire-format HyperLogLog codec tests.

Hash golden vectors: MURMUR_* were generated from Guava's independent
``Hashing.murmur3_128()`` (same canonical x64_128 airlift implements)
via py4j in this environment; xxHash is anchored three ways — the
published seed-0 empty-input vector from the xxHash reference spec, a
live comparison against Spark SQL's ``xxhash64`` (seed 42) for the
byte path, and vectorized-vs-scalar internal consistency for the long
path.
"""

import struct

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from facebook_presto_spark.functions import presto_hll as hll
from facebook_presto_spark.functions import presto_hll_spark as hs

# Guava murmur3_128().hashBytes(...).asLong() — first 64 bits, LE
MURMUR_BYTES_GOLDEN = {
    b"": 0x0,
    b"a": 0x85555565F6597889,
    b"abc": 0xB4963F3F3FAD7867,
    b"hello world": 0x533F6046EB7F610E,
    bytes(range(16)): 0x444924B591903F30,
    bytes(range(24)): 0x734E846275B2DFDE,
    bytes(range(37)): 0x5174AD5EDD02D820,
    "presto-é中文".encode("utf-8"): 0x37B9A318A44CBDB7,
    b"x" * 100: 0x0404E50288596AE2,
}

# Guava murmur3_128 of the 8-byte little-endian long (airlift hash64(long))
MURMUR_LONG_GOLDEN = {
    0: 0x28DF63B7CC57C3CB,
    1: 0x004403B7FB05C44A,
    -1: 0xA0E4B27A1ABAED73,
    42: 0xB6ACC39989D27DF8,
    9223372036854775807: 0x6C76EBCBDAD669D4,
    -9223372036854775808: 0x01159DFEB4593227,
    123456789123456789: 0x06D8CA28D8176152,
    -987654321: 0xE211C32DAF496E51,
}

LONGS = list(MURMUR_LONG_GOLDEN)


class TestHashes:
    def test_murmur_bytes_golden(self):
        for data, expect in MURMUR_BYTES_GOLDEN.items():
            assert hll.murmur3_hash64_bytes(data) == expect, data

    def test_murmur_long_vectorized_golden(self):
        got = hll.murmur3_hash64_longs(np.array(LONGS, dtype=np.int64))
        for v, g in zip(LONGS, got):
            assert int(g) == MURMUR_LONG_GOLDEN[v], v

    def test_murmur_long_equals_bytes_of_le_encoding(self):
        got = hll.murmur3_hash64_longs(np.array(LONGS, dtype=np.int64))
        for v, g in zip(LONGS, got):
            assert int(g) == hll.murmur3_hash64_bytes(struct.pack("<q", v))

    def test_xxhash_published_vector(self):
        # xxHash reference spec: XXH64 of empty input, seed 0
        assert hll.xxhash64_bytes(b"") == 0xEF46DB3751D8E999

    def test_xxhash_bytes_vs_spark_sql_seed42(self, spark):
        cases = [b"", b"a", b"abc", bytes(range(37)), bytes(range(100))]
        df = spark.createDataFrame([(bytearray(c),) for c in cases], "b: binary")
        rows = df.select(F.xxhash64("b").alias("h")).collect()
        for c, r in zip(cases, rows):
            assert int(np.uint64(np.int64(r.h))) == hll.xxhash64_bytes(c, seed=42)

    def test_xxhash_long_vectorized_vs_scalar(self):
        got = hll.xxhash64_longs(np.array(LONGS, dtype=np.int64))
        for v, g in zip(LONGS, got):
            assert int(g) == hll.xxhash64_bytes(struct.pack("<q", v)), v


class TestWireFormat:
    def test_sparse_layout_bytes(self):
        # hand-built SPARSE_V2: tag 2, p, count, sorted int32 entries
        h = hll.murmur3_hash64_longs(np.arange(5, dtype=np.int64))
        sk = hll.PrestoHll.from_hashes(h)
        raw = sk.serialize()
        assert raw[0] == 2 and raw[1] == 12
        (n,) = struct.unpack_from("<H", raw, 2)
        assert n == 5 and len(raw) == 4 + 4 * n
        entries = np.frombuffer(raw, dtype="<u4", offset=4)
        assert (np.diff(entries.astype(np.int64)) > 0).all()  # sorted unique
        # entry = (top-26-bits << 6) | (nlz(hash<<26)+1)
        for x in h:
            x = int(x)
            b26 = x >> 38
            sh = (x << 26) & ((1 << 64) - 1)
            v = (64 - sh.bit_length() + 1) if sh else (64 - 26 + 1)
            assert (b26 << 6) | min(v, 63) in entries

    def test_dense_layout_bytes(self):
        regs = np.zeros(1 << 12, dtype=np.int64)
        regs[0] = 3   # even bucket -> high nibble
        regs[1] = 2   # odd bucket -> low nibble
        regs[7] = 25  # overflow: delta 15 + overflow 10
        sk = hll.PrestoHll(12, registers=regs)
        raw = sk.serialize()
        assert raw[0] == 3 and raw[1] == 12 and raw[2] == 0  # baseline 0
        deltas = raw[3:3 + 2048]
        assert deltas[0] == (3 << 4) | 2
        assert deltas[3] & 0x0F == 15  # bucket 7 saturated
        (n_over,) = struct.unpack_from("<H", raw, 3 + 2048)
        assert n_over == 1
        (bucket,) = struct.unpack_from("<H", raw, 3 + 2048 + 2)
        assert bucket == 7
        assert raw[3 + 2048 + 2 + 2] == 10  # overflow value
        back = hll.PrestoHll.deserialize(raw)
        assert np.array_equal(back.registers, regs)

    def test_dense_nonzero_baseline(self):
        regs = np.full(1 << 12, 5, dtype=np.int64)
        regs[100] = 9
        raw = hll.PrestoHll(12, registers=regs).serialize()
        assert raw[2] == 5  # baseline = min
        assert np.array_equal(hll.PrestoHll.deserialize(raw).registers, regs)

    def test_roundtrip_dense_random(self):
        rng = np.random.default_rng(3)
        h = hll.murmur3_hash64_longs(
            rng.integers(-2**62, 2**62, 50000, dtype=np.int64)
        )
        sk = hll.PrestoHll.from_hashes(h)
        assert not sk.is_sparse
        back = hll.PrestoHll.deserialize(sk.serialize())
        assert np.array_equal(back.registers, sk.registers)

    def test_unknown_tag_raises(self):
        with pytest.raises(ValueError, match="format tag"):
            hll.PrestoHll.deserialize(b"\x07\x0c")


class TestSketchSemantics:
    def test_sparse_densify_equals_direct(self):
        rng = np.random.default_rng(11)
        h = hll.murmur3_hash64_longs(
            rng.integers(-2**62, 2**62, 100000, dtype=np.int64)
        )
        for p in (4, 11, 12, 16):
            b, v = hll.buckets_values(h, p)
            direct = np.zeros(1 << p, dtype=np.int64)
            np.maximum.at(direct, b, v)
            via_sparse = hll.dense_registers_from_sparse(
                hll.sparse_entries_from_hashes(h), p
            )
            assert np.array_equal(direct, via_sparse), p

    def test_merge_halves_equals_whole(self):
        rng = np.random.default_rng(5)
        h = hll.murmur3_hash64_longs(
            rng.integers(-2**62, 2**62, 80000, dtype=np.int64)
        )
        whole = hll.PrestoHll.from_hashes(h)
        merged = hll.PrestoHll.from_hashes(h[:40000]).merge(
            hll.PrestoHll.from_hashes(h[40000:])
        )
        assert np.array_equal(
            whole.to_dense_registers(), merged.to_dense_registers()
        )
        assert whole.cardinality() == merged.cardinality()

    def test_sparse_merge_stays_sparse_and_exact(self):
        h = hll.murmur3_hash64_longs(np.arange(200, dtype=np.int64))
        a = hll.PrestoHll.from_hashes(h[:120])
        b = hll.PrestoHll.from_hashes(h[120:])
        m = a.merge(b)
        assert m.is_sparse
        assert m.cardinality() == 200  # sparse linear counting: exact here

    def test_mixed_precision_merge_raises(self):
        h = hll.murmur3_hash64_longs(np.arange(10, dtype=np.int64))
        a = hll.PrestoHll.from_hashes(h, buckets=2048)
        b = hll.PrestoHll.from_hashes(h, buckets=4096)
        with pytest.raises(ValueError, match="different indexBitLength"):
            a.merge(b)

    def test_estimator_standard_error(self):
        # 10 trials at p=11: |mean err| well under sigma, std near 2.3%
        rng = np.random.default_rng(0)
        errs = []
        for _ in range(10):
            vals = rng.integers(-2**62, 2**62, 200000, dtype=np.int64)
            h = hll.murmur3_hash64_longs(vals)
            est = hll.PrestoHll.from_hashes(h, buckets=2048).cardinality()
            exact = len(np.unique(vals))
            errs.append((est - exact) / exact)
        assert abs(float(np.mean(errs))) < 0.023
        assert float(np.std(errs)) < 2 * 0.023

    def test_buckets_for_standard_error(self):
        # ApproximateCountDistinctAggregation.standardErrorToBuckets
        assert hll.buckets_for_standard_error(0.023) == 2048
        assert hll.buckets_for_standard_error(0.26) == 16
        assert hll.buckets_for_standard_error(0.0040625) == 65536
        with pytest.raises(ValueError, match="standard error"):
            hll.buckets_for_standard_error(0.001)

    def test_double_hashing_uses_long_bits(self):
        bits = hll._double_to_long_bits(np.array([0.0, -0.0, 1.5, np.nan]))
        assert bits[0] == 0
        assert bits[1] == -(2**63)  # -0.0 keeps its sign bit (Java raw bits)
        assert bits[3] == 0x7FF8000000000000  # canonical NaN


class TestSparkIntegration:
    def test_approx_set_sparse_exact_small_group(self, spark):
        df = spark.createDataFrame(
            [(i % 3, i) for i in range(300)], "g: int, v: long"
        )
        out = hs.approx_set_agg(df, ["g"], "v")
        rows = out.select(
            "g", hs.cardinality_hll("hll").alias("est"), F.col("hll")
        ).collect()
        assert len(rows) == 3
        for r in rows:
            assert r.hll[0] == 2  # sparse at 100 distinct values
            assert r.est == 100   # sparse linear counting is exact here

    def test_merge_across_groups_equals_whole(self, spark):
        df = spark.createDataFrame(
            [((i * 7919) % 50, (i * 104729) % 40000) for i in range(60000)],
            "g: int, v: long",
        )
        per_group = hs.approx_set_agg(df, ["g"], "v")
        merged = per_group.agg(hs.merge_hll_agg("hll").alias("m")).select(
            hs.cardinality_hll("m").alias("est")
        ).collect()[0].est
        whole = hs.approx_set_agg(
            df.withColumn("one", F.lit(1)), ["one"], "v"
        ).select(hs.cardinality_hll("hll").alias("est")).collect()[0].est
        assert merged == whole

    def test_approx_distinct_accuracy_strings(self, spark):
        df = spark.createDataFrame(
            [(1, f"user-{i % 5000}") for i in range(20000)], "g: int, v: string"
        )
        est = hs.approx_distinct_agg(df, ["g"], "v").collect()[0].approx_distinct
        assert abs(est - 5000) / 5000 < 3 * 0.023

    def test_null_values_ignored(self, spark):
        df = spark.createDataFrame(
            [(1, None), (1, 10), (1, 20), (1, None)], "g: int, v: long"
        )
        est = (
            hs.approx_set_agg(df, ["g"], "v")
            .select(hs.cardinality_hll("hll").alias("e"))
            .collect()[0]
            .e
        )
        assert est == 2

    def test_empty_approx_set(self, spark):
        raw = hs.empty_approx_set()
        assert raw[:4] == bytes([2, 12, 0, 0])
        assert hll.PrestoHll.deserialize(raw).cardinality() == 0

    def test_plan_preaggregates_before_python_pack(self, spark):
        df = spark.createDataFrame([(1, i) for i in range(100)], "g: int, v: long")
        plan = hs.approx_set_agg(df, ["g"], "v")._jdf.queryExecution().executedPlan().toString()
        # the JVM-side partial max over (group, bucket) must sit below the
        # grouped-agg python pack — i.e. two aggregate layers, with the
        # hash UDF arrow-evaluated (never BatchEvalPython)
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan
        assert plan.count("HashAggregate") >= 2

    def test_cast_to_p4_forces_dense(self, spark):
        # HyperLogLogOperators.castToP4Hll: sparse sketch -> dense bytes,
        # same estimate regime afterwards (dense linear counting)
        df = spark.createDataFrame([(1, i) for i in range(50)], "g: int, v: long")
        sk = hs.approx_set_agg(df, ["g"], "v")
        r = sk.select(
            F.col("hll"),
            hs.cast_to_p4_hll("hll").alias("p4"),
        ).collect()[0]
        assert r.hll[0] == 2  # sparse
        assert r.p4[0] == 3 and r.p4[1] == 12  # DENSE_V2, same precision
        dense = hll.PrestoHll.deserialize(bytes(r.p4))
        sparse = hll.PrestoHll.deserialize(bytes(r.hll))
        assert np.array_equal(dense.registers, sparse.to_dense_registers())

    def test_double_column_distinguishes_signed_zero(self, spark):
        # Java doubleToLongBits: -0.0 keeps its sign bit, so approx_set
        # counts 0.0 and -0.0 as TWO values (NaNs canonicalize to one)
        df = spark.createDataFrame(
            [(1, 0.0), (1, -0.0), (1, float("nan")), (1, float("nan")), (1, 2.5)],
            "g: int, v: double",
        )
        est = (
            hs.approx_set_agg(df, ["g"], "v")
            .select(hs.cardinality_hll("hll").alias("e"))
            .collect()[0]
            .e
        )
        assert est == 4

    def test_empty_and_oversize_sparse_edges(self):
        empty = hll.PrestoHll(12, entries=np.array([], dtype=np.uint32))
        assert empty.cardinality() == 0
        back = hll.PrestoHll.deserialize(empty.serialize())
        assert back.is_sparse and len(back.entries) == 0
        merged = empty.merge(empty)
        assert merged.cardinality() == 0
        with pytest.raises(ValueError, match="16-bit"):
            hll.PrestoHll(
                26, entries=np.arange(70000, dtype=np.uint32)
            ).serialize()
