"""Rank-error q-digest unit tests (functions/presto_qdigest.py).

Asserts the reference's qdigest contract
(QuantileDigestAggregationFunction.java:58: maxError is a RANK error):
every value_at_quantile answer's rank interval falls within ε·N of q·N,
under builds, batched builds, and merges — replacing the value-error
assertion the round-3 bucket sketch carried.
"""

import numpy as np
import pytest

from facebook_presto_spark.functions.presto_qdigest import QDigest

QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def rank_error(sorted_vals: np.ndarray, answer: int, q: float) -> float:
    n = len(sorted_vals)
    lo = np.searchsorted(sorted_vals, answer, "left")
    hi = np.searchsorted(sorted_vals, answer, "right")
    target = q * n
    if lo <= target <= hi:
        return 0.0
    return min(abs(lo - target), abs(hi - target)) / n


DISTS = {
    "uniform": lambda r: r.randint(0, 1_000_000, 120_000),
    "heavy_tail": lambda r: (1000 / (r.random(120_000) + 0.001)).astype(int),
    "normal_negatives": lambda r: r.normal(-5e8, 1e9, 120_000).astype(int),
    "few_distinct": lambda r: r.choice([3, 7, 7, 7, 42, 1000], 120_000),
}


@pytest.mark.parametrize("name", sorted(DISTS))
def test_rank_error_within_bound(name):
    vals = DISTS[name](np.random.RandomState(7))
    d = QDigest(0.01)
    for chunk in np.array_split(vals, 16):  # batched like mapInPandas
        d.add_values(chunk)
    s = np.sort(vals)
    for q in QS:
        err = rank_error(s, d.value_at_quantile(q), q)
        assert err <= 0.01, (name, q, err)
    # bounded size: O(log U / eps) nodes, never the distinct count
    assert len(d.counts) < 64 / 0.01 * 2


@pytest.mark.parametrize("name", sorted(DISTS))
def test_merge_keeps_contract(name):
    vals = DISTS[name](np.random.RandomState(11))
    parts = np.array_split(vals, 5)
    digests = []
    for p in parts:
        d = QDigest(0.01)
        d.add_values(p)
        digests.append(d)
    merged = digests[0]
    for d in digests[1:]:
        merged = merged.merge(d)
    assert merged.n == len(vals)
    s = np.sort(vals)
    for q in QS:
        err = rank_error(s, merged.value_at_quantile(q), q)
        assert err <= 0.01, (name, q, err)


def test_serde_roundtrip():
    vals = np.random.RandomState(3).randint(-10**12, 10**12, 50_000)
    d = QDigest(0.01)
    d.add_values(vals)
    rt = QDigest.deserialize(d.serialize())
    assert rt.n == d.n and rt.vmin == d.vmin and rt.vmax == d.vmax
    assert rt.counts == d.counts
    for q in QS:
        assert rt.value_at_quantile(q) == d.value_at_quantile(q)


def test_empty_and_single():
    d = QDigest(0.01)
    assert d.value_at_quantile(0.5) is None
    d.add_values([42])
    assert d.value_at_quantile(0.0) == 42
    assert d.value_at_quantile(1.0) == 42
    assert QDigest.deserialize(d.serialize()).value_at_quantile(0.5) == 42


def test_answers_clamped_to_observed_range():
    d = QDigest(0.01)
    d.add_values(np.arange(1000))
    for q in QS:
        a = d.value_at_quantile(q)
        assert 0 <= a <= 999
