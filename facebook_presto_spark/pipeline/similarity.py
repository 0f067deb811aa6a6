"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths, as a large-scale ANN system would have:

- **brute-force cosine top-k** — the exact baseline: query-set × corpus
  join, fixed-point integer dot products, per-query top-k via the same
  row_number()≤k pattern the reference optimizes with
  TopNRowNumberOperator (operator/TopNRowNumberOperator.java:38).  At
  scale: broadcast the (small) query set against the partitioned corpus —
  no corpus shuffle at all; Spark 3.5+ applies the per-group heap
  (InferWindowGroupLimit) so memory stays O(k) per partition.
- **LSH-bucketed ANN** — the scale path: multi-table sign-random-
  projection buckets per vector (deterministic md5-derived hyperplanes,
  no RNG state), candidates = union over tables of same-bucket vectors,
  then exact re-rank.  The probe set's buckets broadcast as a lookup
  mask, so bucketing + candidate match + scoring collapse into ONE
  Arrow pass over the corpus (int64 matmuls, no pair join, no corpus
  shuffle).  Recall vs brute force is unit-tested
  (tests/test_pipeline.py) and the whole query hash-matches the DuckDB
  oracle (literal plane matrix embedded in both plans).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from facebook_presto_spark.plans.tpch import _t

N_QUERIES = 10  # vec_id < 10 are the probe set
TOP_K = 5

VEC_SCALE = 1_000_000  # fixed-point scale shared by bucketing AND scoring


def _fixed_point(X: np.ndarray) -> np.ndarray:
    """round-half-away-from-zero(x · VEC_SCALE) as exact int64 — DuckDB's
    round(), bit-reproducible regardless of batch split or matmul order
    (every subsequent dot product is exact integer arithmetic)."""
    S = X.astype(np.float64) * VEC_SCALE
    return np.where(S >= 0, np.floor(S + 0.5), np.ceil(S - 0.5)).astype(np.int64)


def _collect_queries(emb: DataFrame):
    """Driver-side probe set (tiny by construction — the 100 TB pattern is
    exactly this: query vectors broadcast, corpus never shuffled).
    Returns (q_ids int64[Q], QI int64[Q×dim], q_norm float64[Q])."""
    rows = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    QI = _fixed_point(np.stack([np.asarray(r["embedding"]) for r in rows]))
    q_norm = np.sqrt((QI * QI).sum(axis=1).astype(np.float64))
    return q_ids, QI, q_norm


def _topk(scored: DataFrame) -> DataFrame:
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        scored.filter(F.col("q_id") != F.col("c_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "c_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for each probe vector (vec_id < 10).

    One corpus scan through an Arrow ``mapInPandas``: each batch is a
    single int64 matmul (B×dim @ dim×Q) against the broadcast query
    matrix — the same kernel the LSH bucketing uses — emitting only
    (q_id, c_id, cosine) triples.  No pair join, no corpus shuffle, no
    CodegenFallback HOFs; the only shuffle is the final per-query top-k
    (InferWindowGroupLimit keeps it O(k) per partition).  The reference's
    equivalent hot loop is TopNRowNumberOperator.java:38 over a scored
    cross join."""
    emb = _t(spark, sf_dir, "embeddings")
    q_ids, QI, q_norm = _collect_queries(emb)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            XI = _fixed_point(np.stack(pdf["embedding"].to_numpy()))
            dots = XI @ QI.T                              # B×Q, exact int64
            c_norm = np.sqrt((XI * XI).sum(axis=1).astype(np.float64))
            B, Q = dots.shape
            yield pd.DataFrame({
                "q_id": np.tile(q_ids, B),
                "c_id": np.repeat(pdf["vec_id"].to_numpy(), Q),
                "cosine": (
                    dots.astype(np.float64)
                    / (q_norm[None, :] * c_norm[:, None])
                ).ravel(),
            })

    scored = emb.select("vec_id", "embedding").mapInPandas(
        score, "q_id long, c_id long, cosine double"
    )
    return _topk(scored)


def _fixed_point_sql() -> str:
    """DuckDB twin of _fixed_point: embedding → int64 list."""
    return (
        "list_transform(embedding, x -> "
        f"CAST(round(CAST(x AS DOUBLE) * {VEC_SCALE}) AS BIGINT))"
    )


_EI_CTES = f"""ei AS (
  SELECT vec_id, {_fixed_point_sql()} AS xi FROM embeddings
), e AS (
  SELECT vec_id, xi,
         CAST(list_sum(list_transform(xi, v -> v * v)) AS BIGINT) AS norm_int
  FROM ei
)"""


COSINE_TOPK_SQL = f"""
WITH {_EI_CTES}, scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         CAST(list_sum(list_transform(generate_series(1, len(q.xi)),
              i -> q.xi[i] * c.xi[i])) AS BIGINT)
           / (sqrt(q.norm_int) * sqrt(c.norm_int)) AS cosine
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT q_id, c_id, cosine, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT q_id, c_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


N_TABLES = 8   # LSH hash tables (union of candidates — classic multi-table LSH)
PLANES_PER_TABLE = 4  # sign bits per table → 16 buckets/table
_EMB_DIM = 64  # embedding dimensionality (embeddings.parquet)


def _plane_rows(n_planes: int | None = None) -> list[tuple[int, int, int]]:
    """Deterministic hyperplane table: (plane p, 1-based dim pos, component).

    Component (p, j) is the first 15 md5 hex chars of ``"p_j"`` read as an
    int, mapped to the integer range [-500, 500) (i.e. 1000 × a value in
    [-0.5, 0.5)) — no RNG or driver state, so every executor and the
    DuckDB oracle (which embeds the same literals) agree exactly.
    """
    import hashlib

    rows = []
    for p in range(n_planes if n_planes is not None
                   else N_TABLES * PLANES_PER_TABLE):
        for j in range(1, _EMB_DIM + 1):
            hv = int(hashlib.md5(f"{p}_{j}".encode()).hexdigest()[:15], 16)
            rows.append((p, j, hv % 1000 - 500))
    return rows


def plane_matrix(n_planes: int) -> np.ndarray:
    """n_planes × dim int64 hyperplane matrix from the md5 family."""
    return np.array(
        [[ci for _, _, ci in _plane_rows(n_planes)[p * _EMB_DIM:(p + 1) * _EMB_DIM]]
         for p in range(n_planes)],
        dtype=np.int64,
    )


def sign_lsh_bands(emb: DataFrame, n_tables: int, planes_per_table: int,
                   id_col: str = "vec_id") -> DataFrame:
    """id → one (t, bucket) row per sign-LSH hash table, with
    configurable width: ``planes_per_table`` sign bits per table.  Fixed
    parameters suit query-time ANN; corpus-wide dedup scales the bit
    width with corpus size (see dedup.embedding_lsh_verified) so bucket
    occupancy — and with it candidate-pair count per row — stays O(1)."""
    n_planes = n_tables * planes_per_table
    M = plane_matrix(n_planes)
    weights = np.array([2 ** r for r in range(planes_per_table)], dtype=np.int64)

    @F.pandas_udf("array<long>")
    def buckets(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype="object")
        XI = _fixed_point(np.stack(col.to_numpy()))
        bits = (XI @ M.T > 0).astype(np.int64)  # (B, n_planes)
        bk = (bits.reshape(len(XI), n_tables, planes_per_table) * weights).sum(axis=2)
        return pd.Series(list(bk))

    return emb.select(id_col, F.posexplode(buckets("embedding")).alias("t", "bucket"))


def sign_lsh_bands_sql(n_tables: int, planes_per_table: int) -> str:
    """DuckDB CTE chain (planes → ve → dots → bands) mirroring
    sign_lsh_bands for arbitrary width — embed before a pairs CTE."""
    n_planes = n_tables * planes_per_table
    values = ", ".join(f"({p}, {j}, {ci})" for p, j, ci in _plane_rows(n_planes))
    return f"""planes(p, pos, ci) AS (
  VALUES {values}
), ve AS (
  SELECT vec_id, t.j AS pos,
         CAST(round(CAST(embedding[t.j] AS DOUBLE) * {VEC_SCALE}) AS BIGINT) AS xi
  FROM embeddings, generate_series(1, {_EMB_DIM}) t(j)
), dots AS (
  SELECT vec_id, p.p, sum(xi * p.ci) AS doti
  FROM ve JOIN planes p ON p.pos = ve.pos
  GROUP BY vec_id, p.p
), bands AS (
  SELECT vec_id, p // {planes_per_table} AS t,
         CAST(sum(CASE WHEN doti > 0
              THEN 1 << (p % {planes_per_table}) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id, p // {planes_per_table}
)"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors via multi-table sign-LSH: a candidate
    is any vector sharing ≥1 of the probe's ``N_TABLES`` 4-bit buckets;
    exact cosine re-ranks the candidates.

    One corpus pass does everything: the probe set's buckets are computed
    driver-side (tiny) and broadcast as a (table, bucket) → probe-mask
    lookup; each Arrow batch computes its own buckets (one int64 matmul),
    masks to same-bucket (probe, candidate) pairs, and scores only those
    (a second int64 product).  No band relation, no pair join, no
    distinct — the only shuffle is the final top-k window.  At 100 TB
    the corpus bands would be *precomputed and bucket-partitioned*; the
    probe-side lookup stays a broadcast either way."""
    emb = _t(spark, sf_dir, "embeddings")
    q_ids, QI, q_norm = _collect_queries(emb)
    n_planes = N_TABLES * PLANES_PER_TABLE
    M = plane_matrix(n_planes)
    weights = np.array([2 ** r for r in range(PLANES_PER_TABLE)], dtype=np.int64)
    n_buckets = 2 ** PLANES_PER_TABLE
    qbits = (QI @ M.T > 0).astype(np.int64)
    qbuckets = (
        qbits.reshape(len(q_ids), N_TABLES, PLANES_PER_TABLE) * weights
    ).sum(axis=2)                                     # Q×T
    qmask = np.zeros((N_TABLES, n_buckets, len(q_ids)), dtype=bool)
    for qi in range(len(q_ids)):
        for t in range(N_TABLES):
            qmask[t, qbuckets[qi, t], qi] = True

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            XI = _fixed_point(np.stack(pdf["embedding"].to_numpy()))
            bits = (XI @ M.T > 0).astype(np.int64)
            cb = (
                bits.reshape(len(XI), N_TABLES, PLANES_PER_TABLE) * weights
            ).sum(axis=2)                             # B×T
            match = np.zeros((len(XI), len(q_ids)), dtype=bool)
            for t in range(N_TABLES):
                match |= qmask[t, cb[:, t], :]
            b_idx, q_idx = np.nonzero(match)
            if not len(b_idx):
                continue
            dots = (XI[b_idx] * QI[q_idx]).sum(axis=1)    # exact int64
            c_norm = np.sqrt((XI * XI).sum(axis=1).astype(np.float64))
            yield pd.DataFrame({
                "q_id": q_ids[q_idx],
                "c_id": pdf["vec_id"].to_numpy()[b_idx],
                "cosine": dots.astype(np.float64)
                / (q_norm[q_idx] * c_norm[b_idx]),
            })

    scored = emb.select("vec_id", "embedding").mapInPandas(
        score, "q_id long, c_id long, cosine double"
    )
    return _topk(scored)


N_LISTS = 16   # IVF: coarse-quantizer list count
# nprobe=6 searches ~3/8 of the lists: the driver's synthetic embeddings
# are near-uniform (little natural clustering), so a real-data nprobe of
# 1-2 recalls poorly here; on clustered production embeddings drop this.
N_PROBE = 6    # lists searched per query
_DIM = 64      # embedding dimensionality (embeddings.parquet)


def _centroid_rows() -> list[tuple[int, int, int]]:
    """Deterministic integer centroid table: (list c, 1-based dim pos,
    component), md5-derived — reproducible across runs/executors with no
    RNG state, and embeddable verbatim in the DuckDB oracle.  Component
    (c, j) is the first 4 md5 bytes of ``"{c}c{j}"`` re-centered to
    [-2^31, 2^31) — the integer form of the previous float
    ``bytes/2^32 - 0.5`` (scale 2^32 cancels in argmax comparisons).
    """
    import hashlib

    rows = []
    for c in range(N_LISTS):
        for j in range(_DIM):
            h = hashlib.md5(f"{c}c{j}".encode()).digest()
            rows.append((c, j + 1, int.from_bytes(h[:4], "big") - 2 ** 31))
    return rows


def _centroid_matrix() -> np.ndarray:
    """dim × N_LISTS int64 centroid matrix (columns = coarse lists)."""
    return np.array(
        [[ci for _, _, ci in _centroid_rows()[c * _DIM:(c + 1) * _DIM]]
         for c in range(N_LISTS)],
        dtype=np.int64,
    ).T


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: corpus vectors live in their single nearest
    coarse list; each probe searches its N_PROBE nearest lists and
    re-ranks exactly.

    One corpus pass does everything: per Arrow batch, assign each vector
    to its list (B×dim @ dim×16 exact-int64 matmul — ties to the lowest
    list id, the quantizer of FAISS IVF-Flat), score the batch against
    the broadcast probe matrix (a second int64 matmul), and emit only the
    (probe, candidate) pairs whose list is among that probe's N_PROBE
    probed lists.  No joins, no corpus shuffle, no repeated assignment
    UDF; the only shuffle is the final top-k window.  At 100 TB the
    corpus is *partitioned by list id*, so the probed-lists mask becomes
    partition pruning — the same plan with the scan narrowed."""
    emb = _t(spark, sf_dir, "embeddings")
    q_ids, QI, q_norm = _collect_queries(emb)
    cents = _centroid_matrix()                       # dim×16
    q_dots = QI @ cents                              # Q×16, exact int64
    probe_lists = np.argsort(-q_dots, axis=1, kind="stable")[:, :N_PROBE]
    allowed = np.zeros((len(q_ids), N_LISTS), dtype=bool)
    for qi, lists in enumerate(probe_lists):
        allowed[qi, lists] = True                    # Q×16 probe mask

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            XI = _fixed_point(np.stack(pdf["embedding"].to_numpy()))
            list_id = np.argmax(XI @ cents, axis=1)  # first max = lowest id
            keep = allowed[:, list_id].T             # B×Q pair mask
            b_idx, q_idx = np.nonzero(keep)
            if not len(b_idx):
                continue
            dots = (XI[b_idx] * QI[q_idx]).sum(axis=1)   # exact int64
            c_norm = np.sqrt((XI * XI).sum(axis=1).astype(np.float64))
            yield pd.DataFrame({
                "q_id": q_ids[q_idx],
                "c_id": pdf["vec_id"].to_numpy()[b_idx],
                "cosine": dots.astype(np.float64)
                / (q_norm[q_idx] * c_norm[b_idx]),
            })

    scored = emb.select("vec_id", "embedding").mapInPandas(
        score, "q_id long, c_id long, cosine double"
    )
    return _topk(scored)


def _ann_lsh_oracle_sql() -> str:
    """Mirror of ann_lsh_topk: the same literal integer hyperplane table;
    fixed-point sums are exact, so aggregation order cannot diverge."""
    values = ", ".join(f"({p}, {j}, {ci})" for p, j, ci in _plane_rows())
    return f"""
WITH planes(p, pos, ci) AS (
  VALUES {values}
), ve AS (
  SELECT vec_id, t.j AS pos,
         CAST(round(CAST(embedding[t.j] AS DOUBLE) * {VEC_SCALE}) AS BIGINT) AS xi
  FROM embeddings, generate_series(1, {_EMB_DIM}) t(j)
), dots AS (
  SELECT vec_id, p.p, sum(xi * p.ci) AS doti
  FROM ve JOIN planes p ON p.pos = ve.pos
  GROUP BY vec_id, p.p
), bands AS (
  SELECT vec_id, p // {PLANES_PER_TABLE} AS t,
         CAST(sum(CASE WHEN doti > 0
              THEN CASE p % {PLANES_PER_TABLE} WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END
              ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id, p // {PLANES_PER_TABLE}
), pairs AS (
  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
  FROM bands q JOIN bands c ON q.t = c.t AND q.bucket = c.bucket
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
), {_EI_CTES}, scored AS (
  SELECT p.q_id, p.c_id,
         CAST(list_sum(list_transform(generate_series(1, len(q.xi)),
              i -> q.xi[i] * c.xi[i])) AS BIGINT)
           / (sqrt(q.norm_int) * sqrt(c.norm_int)) AS cosine
  FROM pairs p JOIN e q ON p.q_id = q.vec_id JOIN e c ON p.c_id = c.vec_id
)
SELECT q_id, c_id, cosine, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT q_id, c_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


def _ann_ivf_oracle_sql() -> str:
    """Mirror of ann_ivf_topk: the same literal integer centroid table;
    the exact-int64 quantizer assignment reproduces bit-for-bit."""
    values = ", ".join(f"({c}, {j}, {ci})" for c, j, ci in _centroid_rows())
    return f"""
WITH cents(c, pos, ci) AS (
  VALUES {values}
), ve AS (
  SELECT vec_id, t.j AS pos,
         CAST(round(CAST(embedding[t.j] AS DOUBLE) * {VEC_SCALE}) AS BIGINT) AS xi
  FROM embeddings, generate_series(1, {_EMB_DIM}) t(j)
), dots AS (
  SELECT vec_id, c, CAST(sum(xi * ci) AS BIGINT) AS d
  FROM ve JOIN cents USING (pos)
  GROUP BY vec_id, c
), ranked AS (
  SELECT vec_id, c,
         row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, c) AS rk
  FROM dots
), cand_list AS (
  SELECT vec_id AS c_id, c AS list_id FROM ranked WHERE rk = 1
), probe_list AS (
  SELECT vec_id AS q_id, c AS list_id FROM ranked
  WHERE rk <= {N_PROBE} AND vec_id < {N_QUERIES}
), {_EI_CTES}, scored AS (
  SELECT p.q_id, cl.c_id,
         CAST(list_sum(list_transform(generate_series(1, len(q.xi)),
              i -> q.xi[i] * c.xi[i])) AS BIGINT)
           / (sqrt(q.norm_int) * sqrt(c.norm_int)) AS cosine
  FROM probe_list p JOIN cand_list cl USING (list_id)
  JOIN e q ON p.q_id = q.vec_id JOIN e c ON cl.c_id = c.vec_id
  WHERE p.q_id <> cl.c_id
)
SELECT q_id, c_id, cosine, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT q_id, c_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


QUERIES = {
    "similarity_cosine_topk": cosine_topk,
    "similarity_ann_lsh": ann_lsh_topk,
    "similarity_ann_ivf": ann_ivf_topk,
}

ORACLE = {
    "similarity_cosine_topk": COSINE_TOPK_SQL,
    "similarity_ann_lsh": _ann_lsh_oracle_sql(),
    "similarity_ann_ivf": _ann_ivf_oracle_sql(),
}
