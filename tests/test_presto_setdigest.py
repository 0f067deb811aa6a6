"""Wire-format SetDigest tests (type/setdigest/SetDigest.java layout)."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from facebook_presto_spark.functions import presto_hll as hll
from facebook_presto_spark.functions import presto_setdigest as sd


def _digest_from_values(values, max_hashes=sd.DEFAULT_MAX_HASHES):
    """Reference-shaped single-node construction for comparison."""
    h = hll.murmur3_hash64_longs(np.asarray(values, dtype=np.int64)).view(
        np.int64
    )
    uniq, counts = np.unique(h, return_counts=True)
    order = np.argsort(uniq)  # signed
    keys = uniq[order][:max_hashes]
    cnts = np.minimum(counts[order][:max_hashes], sd.SHORT_MAX)
    sketch = hll.PrestoHll.from_hashes(
        h.view(np.uint64), buckets=sd.NUMBER_OF_BUCKETS
    )
    return sd.serialize_setdigest(sketch.serialize(), keys, cnts, max_hashes)


class TestCodec:
    def test_layout_bytes(self):
        raw = _digest_from_values([1, 2, 3])
        assert raw[0] == 1  # UNCOMPRESSED_FORMAT
        (hll_len,) = struct.unpack_from("<i", raw, 1)
        assert raw[5] == 2  # nested sketch: SPARSE_V2
        assert raw[6] == 11  # 2048 buckets
        mh, n = struct.unpack_from("<ii", raw, 5 + hll_len)
        assert (mh, n) == (8192, 3)
        keys = np.frombuffer(raw, dtype="<i8", count=n, offset=5 + hll_len + 8)
        assert (np.diff(keys) > 0).all()  # signed ascending
        assert len(raw) == 5 + hll_len + 8 + 8 * n + 2 * n

    def test_roundtrip(self):
        raw = _digest_from_values(list(range(500)))
        sketch, keys, counts, mh = sd.deserialize_setdigest(raw)
        assert len(keys) == 500 and mh == 8192
        assert (counts == 1).all()
        assert sd._digest_cardinality(raw) == 500  # exact regime

    def test_counts_accumulate_and_saturate(self):
        raw = _digest_from_values([7] * 5 + [8])
        _, keys, counts, _ = sd.deserialize_setdigest(raw)
        assert sorted(counts.tolist()) == [1, 5]
        merged = sd._merge_digests([raw] * 7000)  # 5*7000 > SHORT_MAX
        _, _, counts, _ = sd.deserialize_setdigest(merged)
        assert max(counts.tolist()) == sd.SHORT_MAX

    def test_bottom_k_trims_largest_signed(self):
        raw = _digest_from_values(list(range(100)), max_hashes=10)
        _, keys, _, mh = sd.deserialize_setdigest(raw)
        assert mh == 10 and len(keys) == 10
        all_hashes = np.sort(
            hll.murmur3_hash64_longs(np.arange(100, dtype=np.int64)).view(
                np.int64
            )
        )
        assert np.array_equal(keys, all_hashes[:10])

    def test_estimate_regime_uses_hll(self):
        vals = list(range(5000))
        raw = _digest_from_values(vals, max_hashes=100)
        # size == maxHashes -> NOT exact (strict inequality)
        est = sd._digest_cardinality(raw)
        assert est != 100
        assert abs(est - 5000) / 5000 < 0.1  # 2048-bucket HLL error

    def test_merge_equals_whole(self):
        a = _digest_from_values(list(range(0, 300)))
        b = _digest_from_values(list(range(200, 500)))
        merged = sd._merge_digests([a, b])
        whole = _digest_from_values(list(range(500)))
        ms, mk, mc, _ = sd.deserialize_setdigest(merged)
        ws, wk, wc, _ = sd.deserialize_setdigest(whole)
        assert np.array_equal(mk, wk)
        # overlap range 200-299 counted twice by merge (multiset add)
        assert mc.sum() == 600 and wc.sum() == 500
        assert np.array_equal(
            ms.to_dense_registers(), ws.to_dense_registers()
        )

    def test_jaccard_identical_and_disjoint(self):
        a = _digest_from_values(list(range(100)))
        assert sd._jaccard(a, a) == 1.0
        b = _digest_from_values(list(range(1000, 1100)))
        assert sd._jaccard(a, b) == 0.0

    def test_jaccard_walks_min_size_union_prefix(self):
        # A subset of B: reference semantics give an ESTIMATE — the
        # first |A| signed-sorted union keys, membership in both
        a_vals, b_vals = list(range(50)), list(range(100))
        a, b = _digest_from_values(a_vals), _digest_from_values(b_vals)
        hashes = np.sort(
            hll.murmur3_hash64_longs(np.arange(100, dtype=np.int64)).view(
                np.int64
            )
        )
        a_set = set(
            hll.murmur3_hash64_longs(np.arange(50, dtype=np.int64))
            .view(np.int64)
            .tolist()
        )
        expect = sum(1 for h in hashes[:50] if int(h) in a_set) / 50
        assert sd._jaccard(a, b) == expect

    def test_intersection_exact_regime(self):
        a = _digest_from_values(list(range(0, 60)))
        b = _digest_from_values(list(range(40, 100)))
        assert sd._intersection_cardinality(a, b) == 20

    def test_bad_version_raises(self):
        with pytest.raises(ValueError, match="version"):
            sd.deserialize_setdigest(b"\x02\x00\x00\x00\x00")


class TestSpark:
    def test_distributed_equals_reference_construction(self, spark):
        rows = [(i % 4, (i * 13) % 900) for i in range(4000)]
        df = spark.createDataFrame(rows, "g: int, v: long")
        got = {
            r.g: bytes(r.digest)
            for r in sd.make_set_digest_agg(df, ["g"], "v").collect()
        }
        for g in range(4):
            vals = [v for gg, v in rows if gg == g]
            expect = _digest_from_values(vals)
            assert got[g] == expect, f"group {g} digest differs"

    def test_cardinality_and_merge_on_spark(self, spark):
        df = spark.createDataFrame(
            [(i % 2, i % 700) for i in range(3000)], "g: int, v: long"
        )
        d = sd.make_set_digest_agg(df, ["g"], "v")
        per = {
            r.g: r.c
            for r in d.select(
                "g", sd.cardinality_setdigest_wire("digest").alias("c")
            ).collect()
        }
        assert per[0] == 350 and per[1] == 350
        merged_card = (
            d.agg(sd.merge_set_digest_agg("digest").alias("m"))
            .select(sd.cardinality_setdigest_wire("m").alias("c"))
            .collect()[0]
            .c
        )
        assert merged_card == 700

    def test_hash_counts_multiplicity(self, spark):
        df = spark.createDataFrame(
            [(1, 5), (1, 5), (1, 9)], "g: int, v: long"
        )
        m = (
            sd.make_set_digest_agg(df, ["g"], "v")
            .select(sd.hash_counts_wire("digest").alias("m"))
            .collect()[0]
            .m
        )
        assert sorted(m.values()) == [1, 2]

    def test_string_values(self, spark):
        df = spark.createDataFrame(
            [(1, f"doc-{i % 40}") for i in range(200)], "g: int, v: string"
        )
        c = (
            sd.make_set_digest_agg(df, ["g"], "v")
            .select(sd.cardinality_setdigest_wire("digest").alias("c"))
            .collect()[0]
            .c
        )
        assert c == 40

    def test_plan_stays_arrow_and_preaggregated(self, spark):
        df = spark.createDataFrame([(1, i) for i in range(10)], "g: int, v: long")
        plan = (
            sd.make_set_digest_agg(df, ["g"], "v")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" in plan
