"""Rank-error quantile digest (q-digest) — the reference's qdigest contract.

Reference: presto-spi QuantileDigest (com.facebook.presto.spi... used by
QuantileDigestAggregationFunction.java:58 and QuantileDigestFunctions.
java:41-91): a compressed counting tree over the int64 domain whose
``maxError`` parameter is a RANK error — ``value_at_quantile(d, q)``
returns a value whose rank in the input is within ``maxError·N`` of
``q·N``.  This module implements the same structure from the published
algorithm (Shrivastava, Buragohain, Agrawal, Suri — "Medians and Beyond:
New Aggregation Techniques for Sensor Networks", SenSys 2004), which is
also what the reference's implementation is built on:

- values map to leaves of a conceptual binary tree over the (shifted)
  uint64 domain; each digest node is (level, prefix) covering
  ``2^level`` consecutive values;
- compression walks leaf-to-root merging any (node, sibling) pair into
  its parent while ``count(node)+count(sibling)+count(parent)`` stays
  under ``⌊ε·N / 64⌋`` — retained size is O(64/ε) nodes and the rank
  error of any quantile answer is ≤ ε·N (the paper's Theorem 1 bounds);
- merge is node-wise count addition followed by re-compression: the
  rank-error contract survives merging (counts only ever move UP the
  tree, which the error bound already accounts for), which is the
  reference's combine-function story.

The serialized form here is this module's own struct layout, NOT the
airlift wire format — the reference's adaptive-radix serialization
cannot be byte-validated in this environment (no airlift source or
artifact; same documented boundary as COVERAGE.md records).  The
map-based bucket sketch in sketch_fns.py remains the SQL-path scalar
surface; this module is the contract-faithful engine path, used by the
``agg_qdigest*`` queries whose oracles assert the rank-error contract
against exact ranks.

Distributed shape (100 TB): ``qdigest_build`` runs as one
``mapInPandas`` pass producing per-(partition, group) partial digests —
the map-side combine — and a ``groupBy(group).applyInPandas`` merge:
only O(64/ε)-node digests ever shuffle, never values.
"""

from __future__ import annotations

import struct

import numpy as np

_LOG_U = 64            # tree height over the uint64 domain
_SIGN_FLIP = 1 << 63   # int64 → order-preserving uint64


class QDigest:
    """Mergeable q-digest over int64 values with rank error ≤ eps·N."""

    __slots__ = ("eps", "n", "vmin", "vmax", "counts")

    def __init__(self, eps: float = 0.01):
        self.eps = float(eps)
        self.n = 0
        self.vmin: int | None = None
        self.vmax: int | None = None
        # (level, prefix) -> count; level 0 = exact value (shifted)
        self.counts: dict[tuple[int, int], int] = {}

    # -- build --------------------------------------------------------------

    def add_values(self, values, lazy: bool = False) -> None:
        arr = np.asarray(values, dtype=np.int64)
        if arr.size == 0:
            return
        shifted = arr.astype(np.uint64) + np.uint64(_SIGN_FLIP)
        uniq, cnt = np.unique(shifted, return_counts=True)
        counts = self.counts
        for u, c in zip(uniq.tolist(), cnt.tolist()):
            key = (0, u)
            counts[key] = counts.get(key, 0) + c
        self.n += int(arr.size)
        lo, hi = int(arr.min()), int(arr.max())
        self.vmin = lo if self.vmin is None else min(self.vmin, lo)
        self.vmax = hi if self.vmax is None else max(self.vmax, hi)
        if not lazy or len(counts) > self._max_nodes():
            self.compress()

    def _threshold(self) -> int:
        return max(1, int(self.eps * self.n / _LOG_U))

    def compress(self) -> None:
        """Leaf-to-root sibling merge under the εN/log U threshold
        (the paper's COMPRESS; deterministic given the counts).  Keys
        are bucketed by level ONCE — the first spelling rescanned the
        whole dict per level (64 scans/call), which a 10× scale probe
        surfaced as superlinear merge cost."""
        t = self._threshold()
        counts = self.counts
        by_level: dict[int, list] = {}
        for k in counts:
            by_level.setdefault(k[0], []).append(k)
        for level in range(_LOG_U):
            for key in by_level.get(level, ()):
                c = counts.get(key)
                if c is None:
                    continue
                _lvl, prefix = key
                sib = (level, prefix ^ 1)
                parent = (level + 1, prefix >> 1)
                total = c + counts.get(sib, 0) + counts.get(parent, 0)
                if total < t:
                    counts.pop(key, None)
                    counts.pop(sib, None)
                    if parent not in counts:
                        by_level.setdefault(level + 1, []).append(parent)
                    counts[parent] = total

    # -- merge --------------------------------------------------------------

    def _max_nodes(self) -> int:
        return int(8 * _LOG_U / self.eps)

    def merge(self, other: "QDigest", lazy: bool = False) -> "QDigest":
        """Node-wise count addition.  ``lazy=True`` defers compression
        until the node count exceeds 8·64/ε — merging thousands of
        partials re-compressed after EVERY merge is the superlinear trap
        a 10× scale probe caught (5.3× wall-clock growth); deferred
        compaction restores the linear merge path and compresses better
        (the threshold sees the full merged N)."""
        for key, c in other.counts.items():
            self.counts[key] = self.counts.get(key, 0) + c
        self.n += other.n
        if other.vmin is not None:
            self.vmin = other.vmin if self.vmin is None else min(self.vmin, other.vmin)
            self.vmax = other.vmax if self.vmax is None else max(self.vmax, other.vmax)
        if not lazy or len(self.counts) > self._max_nodes():
            self.compress()
        return self

    # -- query --------------------------------------------------------------

    def value_at_quantile(self, q: float) -> int | None:
        """Smallest node upper bound whose cumulative count reaches
        rank ⌈q·N⌉, clamped to the observed [min, max] — the
        reference's lower-bound traversal (QuantileDigest.getQuantiles
        walks in upper-bound order and caps to the observed max)."""
        if self.n == 0:
            return None
        target = max(1, int(np.ceil(q * self.n)))
        # order nodes by the largest value they cover (ties: deeper first)
        def upper(key):
            level, prefix = key
            return ((prefix + 1) << level) - 1

        cum = 0
        for key in sorted(self.counts, key=lambda k: (upper(k), k[0])):
            cum += self.counts[key]
            if cum >= target:
                value = upper(key) - _SIGN_FLIP
                return min(max(value, self.vmin), self.vmax)
        return self.vmax

    # -- serde (module-local layout, not airlift) ---------------------------

    _HDR = struct.Struct("<dqqqI")

    def serialize(self) -> bytes:
        items = sorted(self.counts.items())
        out = [self._HDR.pack(self.eps, self.n, self.vmin or 0, self.vmax or 0,
                              len(items))]
        for (level, prefix), c in items:
            out.append(struct.pack("<BQq", level, prefix, c))
        return b"".join(out)

    @classmethod
    def deserialize(cls, buf: bytes) -> "QDigest":
        eps, n, vmin, vmax, k = cls._HDR.unpack_from(buf, 0)
        d = cls(eps)
        d.n, d.vmin, d.vmax = n, (vmin if n else None), (vmax if n else None)
        off = cls._HDR.size
        rec = struct.Struct("<BQq")
        for _ in range(k):
            level, prefix, c = rec.unpack_from(buf, off)
            off += rec.size
            d.counts[(level, prefix)] = c
        return d


# -- Spark integration -------------------------------------------------------

def qdigest_build(df, group_cols: list[str], value_col: str,
                  max_error: float = 0.01):
    """``df.groupBy(group_cols) → (group_cols…, qdigest binary)``.

    Two stages, both Arrow: (1) mapInPandas builds one partial digest
    per (Arrow batch, group) — the map-side combine, so only
    O(64/ε)-node digests shuffle; (2) applyInPandas merges the partials
    per group (QuantileDigestAggregationFunction's combine/output)."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    schema = ", ".join(
        f"`{c}` {dict(df.dtypes)[c]}" for c in group_cols
    ) + ", qdigest binary"

    def partials(batches):
        # ONE digest per (group, partition), accumulated across the
        # partition's Arrow batches — per-batch digests made the merge
        # stage superlinear at 10× (thousands of partials per group);
        # per-partition partials keep the count at O(partitions).
        acc: dict[tuple, QDigest] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            for keys, part in pdf.groupby(group_cols, sort=False):
                if not isinstance(keys, tuple):
                    keys = (keys,)
                d = acc.setdefault(keys, QDigest(max_error))
                d.add_values(part[value_col].to_numpy(dtype=np.int64), lazy=True)
        out = []
        for keys, d in acc.items():
            d.compress()
            out.append((*keys, d.serialize()))
        yield pd.DataFrame(out, columns=[*group_cols, "qdigest"])

    part_df = df.select(*group_cols, value_col).mapInPandas(partials, schema)

    def merge_group(pdf):
        d = QDigest(max_error)
        for buf in pdf["qdigest"]:
            d.merge(QDigest.deserialize(bytes(buf)), lazy=True)
        d.compress()
        row = {c: [pdf[c].iloc[0]] for c in group_cols}
        row["qdigest"] = [d.serialize()]
        return pd.DataFrame(row)

    return part_df.groupBy(*group_cols).applyInPandas(merge_group, schema)


def value_at_quantile_col(digest_col, q: float):
    """Scalar column: value_at_quantile(qdigest, q) over the binary state
    (QuantileDigestFunctions.java:41)."""
    import pandas as pd
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def vaq(col):
        return pd.Series(
            [
                None if b is None else QDigest.deserialize(bytes(b)).value_at_quantile(q)
                for b in col
            ],
            dtype="Int64",
        )

    return vaq(digest_col)
