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
  then exact re-rank.  Bucketing is one narrow map; the candidate join
  is an equi-join on (table, bucket).  Recall vs brute force is
  unit-tested (tests/test_pipeline.py) and the whole query hash-matches
  the DuckDB oracle (literal plane matrix embedded in both plans).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from facebook_presto_spark.plans.tpch import _t

N_QUERIES = 10  # vec_id < 10 are the probe set
TOP_K = 5



def _dot_int(a: Column, b: Column) -> Column:
    """Order-independent fixed-point dot product (see pipeline/dedup.py)."""
    prods = F.zip_with(
        a, b, lambda x, y: F.round(x.cast("double") * y.cast("double") * F.lit(1e12))
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v).cast("long")


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for each probe vector (vec_id < 10)."""
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        "embedding",
        _dot_int(F.col("embedding"), F.col("embedding")).alias("norm_int"),
    )
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm_int").alias("q_norm"),
    )
    cands = base.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm_int").alias("c_norm"),
    )
    scored = (
        F.broadcast(queries)
        .join(cands, F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            (
                _dot_int(F.col("q_emb"), F.col("c_emb"))
                / (F.sqrt(F.col("q_norm")) * F.sqrt(F.col("c_norm")))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "c_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


COSINE_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding,
         CAST(list_sum(list_transform(generate_series(1, len(embedding)),
              i -> round(CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)*1e12))) AS BIGINT) AS norm_int
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         CAST(list_sum(list_transform(generate_series(1, len(q.embedding)),
              i -> round(CAST(q.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE)*1e12))) AS BIGINT)
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


VEC_SCALE = 1_000_000  # fixed-point scale for plane-projection signs


def _plane_rows() -> list[tuple[int, int, int]]:
    """Deterministic hyperplane table: (plane p, 1-based dim pos, component).

    Component (p, j) is the first 15 md5 hex chars of ``"p_j"`` read as an
    int, mapped to the integer range [-500, 500) (i.e. 1000 × a value in
    [-0.5, 0.5)) — no RNG or driver state, so every executor and the
    DuckDB oracle (which embeds the same literals) agree exactly.
    """
    import hashlib

    rows = []
    for p in range(N_TABLES * PLANES_PER_TABLE):
        for j in range(1, _EMB_DIM + 1):
            hv = int(hashlib.md5(f"{p}_{j}".encode()).hexdigest()[:15], 16)
            rows.append((p, j, hv % 1000 - 500))
    return rows


def _bands(emb: DataFrame) -> DataFrame:
    """vec_id → one (t, bucket) row per LSH hash table.

    The 32 plane projections per vector are one dense int64 matmul — an
    Arrow-batched pandas UDF is the right tool (the zip_with/aggregate
    HOF spelling of the same math is CodegenFallback and measured ~5×
    slower; a posexplode+broadcast-join spelling paid seconds of plan
    compile per run).  Fixed-point (half-away-from-zero round(x·1e6) ×
    integer component, exactly DuckDB's round) keeps every dot product an
    exact integer, so batch order cannot perturb the bucket bits and the
    oracle reproduces them bit-for-bit.
    """
    import numpy as np

    M = np.array(
        [[ci for _, _, ci in _plane_rows()[p * _EMB_DIM:(p + 1) * _EMB_DIM]]
         for p in range(N_TABLES * PLANES_PER_TABLE)],
        dtype=np.int64,
    )  # (32, 64)
    weights = np.array([2 ** r for r in range(PLANES_PER_TABLE)], dtype=np.int64)

    @F.pandas_udf("array<long>")
    def buckets(col: pd.Series) -> pd.Series:
        X = np.stack(col.to_numpy()).astype(np.float64) * VEC_SCALE
        XI = np.where(X >= 0, np.floor(X + 0.5), np.ceil(X - 0.5)).astype(np.int64)
        bits = (XI @ M.T > 0).astype(np.int64)  # (B, 32)
        b8 = (bits.reshape(len(XI), N_TABLES, PLANES_PER_TABLE) * weights).sum(axis=2)
        return pd.Series(list(b8))

    return emb.select("vec_id", F.posexplode(buckets("embedding")).alias("t", "bucket"))


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors via multi-table sign-LSH: a candidate is
    any vector sharing ≥1 of the probe's ``N_TABLES`` 4-bit buckets; exact
    cosine re-ranks the candidates.  Plan shape: one narrow band pass, one
    equi-join on (table, bucket), distinct, re-rank — nothing quadratic,
    and the only shuffles carry (table, bucket, id) triples.
    """
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        "embedding",
        _dot_int(F.col("embedding"), F.col("embedding")).alias("norm_int"),
    )
    bands = _bands(emb)
    # probe-side bands from the (tiny) probe subset — referencing `bands`
    # twice would run the full-corpus band pass once per join branch
    q_bands = _bands(emb.filter(F.col("vec_id") < N_QUERIES)).select(
        F.col("vec_id").alias("q_id"), "t", "bucket"
    )
    pairs = (
        F.broadcast(q_bands)
        .join(bands.select(F.col("vec_id").alias("c_id"), "t", "bucket"), ["t", "bucket"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .distinct()
    )
    q_side = base.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm_int").alias("q_norm"),
    )
    c_side = base.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm_int").alias("c_norm"),
    )
    scored = (
        pairs.join(F.broadcast(q_side), "q_id")
        .join(c_side, "c_id")
        .select(
            "q_id",
            "c_id",
            (
                _dot_int(F.col("q_emb"), F.col("c_emb"))
                / (F.sqrt(F.col("q_norm")) * F.sqrt(F.col("c_norm")))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "c_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


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


def _nearest_lists_udf(n: int):
    """pandas UDF: embedding → n nearest coarse-list ids (by projection).

    The relational form (16 centroids × 64 components as Catalyst
    expressions) builds a codegen tree too large to JIT well; one Arrow
    batch matmul (B×64 @ 64×16) does the assignment three orders of
    magnitude faster and stays fully vectorized.  Exact int64 arithmetic
    (fixed-point vectors × integer centroids, ≤1.4e17 per dot) makes the
    assignment bit-reproducible in the DuckDB oracle; ties break by list
    id via the stable argsort.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cents = np.array(
        [[ci for _, _, ci in _centroid_rows()[c * _DIM:(c + 1) * _DIM]]
         for c in range(N_LISTS)],
        dtype=np.int64,
    ).T  # 64×16

    # no parameter annotations: `from __future__ import annotations` turns
    # them into strings pandas_udf can't resolve — returnType says it all
    def nearest(emb):
        mat = np.stack(emb.to_numpy()).astype("float64") * VEC_SCALE  # B×64
        xi = np.where(mat >= 0, np.floor(mat + 0.5), np.ceil(mat - 0.5)).astype(np.int64)
        dots = xi @ cents                        # B×16, exact int64
        order = np.argsort(-dots, axis=1, kind="stable")[:, :n]
        return pd.Series(list(order.astype("int32")))

    return pandas_udf(nearest, "array<int>")


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: corpus vectors live in their single nearest
    coarse list; each probe searches its N_PROBE nearest lists and
    re-ranks exactly.  At 100 TB the corpus is *partitioned by list id*
    (one narrow assignment map, no corpus shuffle afterward) and probes
    broadcast — the FAISS IVF-Flat layout expressed relationally."""
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        "embedding",
        _dot_int(F.col("embedding"), F.col("embedding")).alias("norm_int"),
    )
    cands = base.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm_int").alias("c_norm"),
        F.element_at(_nearest_lists_udf(1)(F.col("embedding")), 1).alias("list_id"),
    )
    queries = (
        base.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.col("norm_int").alias("q_norm"),
            F.explode(_nearest_lists_udf(N_PROBE)(F.col("embedding"))).alias("list_id"),
        )
    )
    scored = (
        F.broadcast(queries)
        .join(cands, ["list_id"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            (
                _dot_int(F.col("q_emb"), F.col("c_emb"))
                / (F.sqrt(F.col("q_norm")) * F.sqrt(F.col("c_norm")))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "c_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


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
), e AS (
  SELECT vec_id, embedding,
         CAST(list_sum(list_transform(generate_series(1, len(embedding)),
              i -> round(CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)*1e12))) AS BIGINT) AS norm_int
  FROM embeddings
), scored AS (
  SELECT p.q_id, p.c_id,
         CAST(list_sum(list_transform(generate_series(1, len(q.embedding)),
              i -> round(CAST(q.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE)*1e12))) AS BIGINT)
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
), e AS (
  SELECT vec_id, embedding,
         CAST(list_sum(list_transform(generate_series(1, len(embedding)),
              i -> round(CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)*1e12))) AS BIGINT) AS norm_int
  FROM embeddings
), scored AS (
  SELECT p.q_id, cl.c_id,
         CAST(list_sum(list_transform(generate_series(1, len(q.embedding)),
              i -> round(CAST(q.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE)*1e12))) AS BIGINT)
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
