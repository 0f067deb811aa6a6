"""ML functions mirroring the presto-ml plugin surface.

Reference: presto-ml/src/main/java/com/facebook/presto/ml/MLFunctions.java
(classify/regress), LearnClassifierAggregation.java /
LearnRegressorAggregation.java (learn_*), MLFeaturesFunctions.java
(features).  The reference trains a libsvm SVM by collecting the whole
input into a single aggregation state — inherently single-node.  The
Spark-first re-expression keeps the API shape (features / learn_* /
classify / regress) but swaps in models whose TRAINING is a distributed
aggregation:

- ``learn_regressor`` — ordinary least squares via sufficient statistics
  (Σx, Σy, Σxy, Σx², Σy², n): one map-side-combined groupBy, no data
  collected to the driver.  Exact DECIMAL(38) integer sums (inputs are
  quantized to integers first) make the fitted slope/intercept
  bit-reproducible across engines — each final coefficient is a single
  IEEE division of exact integers.
- ``learn_classifier`` — nearest-centroid: per-(label, dim) integer sums
  → centroids; ``classify`` broadcasts the tiny model and picks the
  argmin-distance label.  Distances compare as n²·d² integer forms so
  everything stays exact until one final division per (row, label).
- ``learn_svm`` — the reference's actual model family (linear SVM),
  trained by deterministic full-batch Pegasos: each iteration is one
  distributed aggregation of exact int64 subgradient sums; the driver
  holds only the weight vector.  Margins and final scores are exact
  integer fixed-point products, and the float weight updates are fixed
  expressions the DuckDB oracle replays bit-for-bit (ml_svm_classifier
  hash-matches through all 10 unrolled training iterations).

At 100 TB: regression/centroid training is one shuffle of a few numbers
per group; SVM training is T passes each shuffling 65 integers;
classification joins against a broadcast model — nothing quadratic,
nothing driver-side but the weights.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# Quantization scales: inputs are rounded to integers (value·SCALE) so
# sums are exact.  VEC_SCALE=1e5 keeps n²-scaled squared distances within
# 63 bits up to ~50k rows/label (document scale bound; raise to DECIMAL
# sums beyond that).
VEC_SCALE = 100_000


# the scalar ``features()`` constructor is registered in
# facebook_presto_spark.functions.ml_fns alongside the other scalars.


def learn_regressor(
    df: DataFrame, y: Column, x: Column, group_by: list[str] | None = None
) -> DataFrame:
    """OLS y ≈ slope·x + intercept from exact integer sufficient stats.

    ``x`` and ``y`` must already be integer-valued columns (quantize
    upstream); sums run in DECIMAL(38,0) so they are exact at any scale
    factor, and each reported coefficient is one double division.
    """
    xl = x.cast("decimal(38,0)")
    yl = y.cast("decimal(38,0)")
    aggs = [
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(xl).alias("sx"),
        F.sum(yl).alias("sy"),
        F.sum(xl * yl).cast("decimal(38,0)").alias("sxy"),
        F.sum(xl * xl).cast("decimal(38,0)").alias("sxx"),
        F.sum(yl * yl).cast("decimal(38,0)").alias("syy"),
    ]
    grouped = df.groupBy(*group_by).agg(*aggs) if group_by else df.agg(*aggs)
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("decimal(38,0)")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("decimal(38,0)")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("decimal(38,0)")
    slope = num.cast("double") / den.cast("double")
    return grouped.select(
        *(group_by or []),
        F.col("n").cast("bigint").alias("n"),
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("intercept"),
        (
            (num.cast("double") * num.cast("double"))
            / (den.cast("double") * deny.cast("double"))
        ).alias("r2"),
    )


def regress(df: DataFrame, model: DataFrame, x: Column, on: list[str] | None = None) -> DataFrame:
    """Apply a learn_regressor model: broadcast the (tiny) model and emit
    ``prediction`` — mirrors Presto regress(features, model)."""
    joined = df.join(F.broadcast(model), on=on) if on else df.crossJoin(F.broadcast(model))
    return joined.withColumn(
        "prediction", F.col("intercept") + F.col("slope") * x.cast("double")
    )


def _quantized(vec: Column) -> Column:
    return F.transform(
        vec, lambda v: F.round(v.cast("double") * F.lit(float(VEC_SCALE))).cast("long")
    )


def learn_classifier(df: DataFrame, label: Column, vec: Column, dim: int) -> DataFrame:
    """Nearest-centroid classifier: label → (n, per-dim integer sums).

    One posexplode + groupBy(label, dim) with map-side combine, then the
    sums are re-assembled into an ordered array — the model is
    #labels × (dim+2) numbers, always broadcastable.
    """
    q = df.select(label.alias("label"), _quantized(vec).alias("vi"))
    per_dim = q.select("label", F.posexplode("vi").alias("pos", "v")).groupBy(
        "label", "pos"
    ).agg(F.sum("v").alias("s"))
    return (
        per_dim.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "s"))).alias("ps"))
        .join(q.groupBy("label").agg(F.count(F.lit(1)).alias("n")), "label")
        .select(
            "label",
            "n",
            F.transform("ps", lambda e: e["s"]).alias("sums"),
        )
    )


def classify(df: DataFrame, model: DataFrame, vec: Column, id_col: str) -> DataFrame:
    """Assign each row the centroid label minimizing squared distance.

    d²·n² = Σ_i (n·v_i − s_i)² keeps the comparison exact-integer; the
    single double division per candidate restores cross-label
    comparability deterministically.  The model is broadcast — at scale
    this is a map-only pass over the data.
    """
    cand = df.select(
        F.col(id_col), _quantized(vec).alias("vi")
    ).crossJoin(F.broadcast(model.select(F.col("label").alias("cand"), "n", "sums")))
    nd2 = F.aggregate(
        F.zip_with(
            "vi", "sums", lambda v, s: (F.col("n") * v - s) * (F.col("n") * v - s)
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    scored = cand.select(
        id_col,
        "cand",
        (nd2.cast("double") / (F.col("n").cast("double") * F.col("n").cast("double"))).alias("d2"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("d2", "cand")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("cand").alias("predicted"))
    )


# ---------------------------------------------------------------------------
# driver queries + DuckDB oracles
# ---------------------------------------------------------------------------

def linear_regression(spark, sf_dir: str) -> DataFrame:
    """learn_regressor per l_returnflag: price-cents ≈ slope·quantity + b."""
    from facebook_presto_spark.plans.tpch import _t

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    return learn_regressor(li, F.col("y"), F.col("x"), group_by=["l_returnflag"])


ML_LINEAR_REGRESSION_SQL = """
WITH q AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
), s AS (
  SELECT l_returnflag, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
         sum(x*x) AS sxx, sum(y*y) AS syy
  FROM q GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
       (CAST(sy AS DOUBLE)
         - (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE))
           * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
       (CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE))
         / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)) AS r2
FROM s
"""


def classify_centroid(spark, sf_dir: str) -> DataFrame:
    """learn_classifier + classify round-trip over the embeddings table."""
    from facebook_presto_spark.plans.tpch import _t

    emb = _t(spark, sf_dir, "embeddings")
    model = learn_classifier(emb, F.col("label"), F.col("embedding"), 64)
    pred = classify(emb, model, F.col("embedding"), "vec_id")
    return (
        pred.join(emb.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            F.col("label").alias("true_label"),
            "predicted",
            (F.col("predicted") == F.col("label")).alias("correct"),
        )
    )


ML_CLASSIFY_CENTROID_SQL = """
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) * 100000) AS BIGINT)) AS vi
  FROM embeddings
), cent AS (
  SELECT label, t.i AS pos, sum(vi[t.i]) AS s
  FROM v, generate_series(1, 64) t(i)
  GROUP BY label, t.i
), cnt AS (
  SELECT label, count(*) AS n FROM v GROUP BY label
), m AS (
  SELECT c.label, any_value(cnt.n) AS n, list(c.s ORDER BY c.pos) AS sums
  FROM cent c JOIN cnt USING (label)
  GROUP BY c.label
), d AS (
  SELECT v.vec_id, v.label AS true_label, m.label AS cand,
         CAST(list_sum(list_transform(generate_series(1, 64),
              i -> (m.n * vi[i] - sums[i]) * (m.n * vi[i] - sums[i]))) AS DOUBLE)
           / (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)) AS d2
  FROM v CROSS JOIN m
), r AS (
  SELECT vec_id, true_label, cand,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cand) AS rn
  FROM d
)
SELECT vec_id, true_label, cand AS predicted, cand = true_label AS correct
FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Linear SVM — the reference's actual model family (presto-ml trains a
# libsvm SVM inside LearnClassifierAggregation.java).  Training here is
# deterministic distributed full-batch Pegasos: each iteration is ONE
# aggregation over the data (exact int64 subgradient sums — order-free),
# the driver holds only the (dim+1)-float weight vector, and every float
# update is a fixed arithmetic expression the DuckDB oracle replays
# bit-for-bit (the oracle unrolls the same iterations as CTEs).  At
# 100 TB: T passes over the data, each a map-side-combined sum of 65
# integers — nothing collected but the gradient.

SVM_LAMBDA = 0.01
SVM_ITERS = 10
W_SCALE = 1_000_000  # weight quantization for exact integer margins
_SVM_DIM = 64
# real margin 1.0 in (VEC_SCALE · W_SCALE) fixed-point units
_MARGIN_INT = VEC_SCALE * W_SCALE


def _wq(w: list[float]) -> list[int]:
    """Quantize weights half-away-from-zero — the floor(x·S + 0.5)
    spelling both engines share (Python round() is banker's)."""
    import math

    return [int(math.floor(x * W_SCALE + 0.5)) for x in w]


def _svm_base(df: DataFrame, label: Column, vec: Column) -> DataFrame:
    """(id, y ∈ {+1,−1}, xi int64[dim+1]) with a constant bias feature."""
    y = F.when(label % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    xi = F.concat(_quantized(vec), F.array(F.lit(VEC_SCALE).cast("long")))
    return df.select(F.col("vec_id"), y.alias("y"), xi.alias("xi"))


def _margin_udf(wq: list[int]):
    import numpy as np
    import pandas as pd

    W = np.array(wq, dtype=np.int64)

    @F.pandas_udf("long")
    def dot(xi):
        if not len(xi):
            return pd.Series([], dtype="int64")
        return pd.Series(np.stack(xi.to_numpy()).astype(np.int64) @ W)

    return dot


def learn_svm(df: DataFrame, label: Column, vec: Column,
              iters: int = SVM_ITERS) -> list[float]:
    """Full-batch Pegasos: w ← (1 − η_t λ)·w + (η_t/n)·Σ_{margin<1} y·x,
    η_t = 1/(λt).  Margins compare as exact int64 fixed-point products,
    so the violator set — and with it every gradient sum — is
    deterministic regardless of partitioning."""
    base = _svm_base(df, label, vec)
    n = base.count()
    w = [0.0] * (_SVM_DIM + 1)
    for t in range(1, iters + 1):
        dot = _margin_udf(_wq(w))
        viol = base.filter(F.col("y") * dot(F.col("xi")) < F.lit(_MARGIN_INT))
        g_rows = (
            viol.select("y", F.posexplode("xi").alias("pos", "v"))
            .groupBy("pos")
            .agg(F.sum(F.col("y") * F.col("v")).alias("g"))
            .collect()
        )
        g = [0] * (_SVM_DIM + 1)
        for r in g_rows:
            g[r["pos"]] = r["g"]
        eta = 1.0 / (SVM_LAMBDA * t)
        w = [
            (1.0 - eta * SVM_LAMBDA) * w[j] + (eta / n) * (g[j] / VEC_SCALE)
            for j in range(_SVM_DIM + 1)
        ]
    return w


def svm_classifier(spark, sf_dir: str) -> DataFrame:
    """learn_classifier/classify with the reference's model family: train
    the linear SVM distributively, then classify with exact integer
    scores (score_int = Σ xi·wq of the final quantized weights)."""
    from facebook_presto_spark.plans.tpch import _t

    emb = _t(spark, sf_dir, "embeddings")
    w = learn_svm(emb, F.col("label"), F.col("embedding"))
    base = _svm_base(emb, F.col("label"), F.col("embedding"))
    dot = _margin_udf(_wq(w))
    return base.select(
        "vec_id",
        "y",
        dot(F.col("xi")).alias("score_int"),
        F.when(dot(F.col("xi")) >= 0, F.lit(1)).otherwise(F.lit(-1)).alias("predicted"),
    ).withColumn("correct", F.col("predicted") == F.col("y"))


def _svm_oracle_sql() -> str:
    """The identical training unrolled as CTEs: per iteration, quantize
    the weights, find violators by exact integer margin, sum the integer
    subgradient per dimension, and apply the same float update with the
    same literal η_t — double arithmetic matches the driver's
    operation-for-operation."""
    dim1 = _SVM_DIM + 1
    parts = [f"""v AS (
  SELECT vec_id,
         CASE WHEN label % 2 = 0 THEN 1 ELSE -1 END AS y,
         list_append(list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * {VEC_SCALE}) AS BIGINT)),
             CAST({VEC_SCALE} AS BIGINT)) AS xi
  FROM embeddings
), nn AS (SELECT count(*) AS n FROM v),
w0(w) AS MATERIALIZED (SELECT [{", ".join(["0.0"] * dim1)}])"""]
    for t in range(1, SVM_ITERS + 1):
        eta = 1.0 / (SVM_LAMBDA * t)
        coef = 1.0 - eta * SVM_LAMBDA
        parts.append(f"""wq{t}(wq) AS MATERIALIZED (
  SELECT list_transform(w, x -> CAST(floor(x * {W_SCALE} + 0.5) AS BIGINT)) FROM w{t - 1}
), viol{t} AS MATERIALIZED (
  SELECT v.y, v.xi FROM v, wq{t}
  WHERE v.y * list_sum(list_transform(generate_series(1, {dim1}),
        i -> v.xi[i] * wq[i])) < {_MARGIN_INT}
), g{t}(g) AS MATERIALIZED (
  SELECT coalesce(list(s ORDER BY pos), list_transform(generate_series(1, {dim1}), i -> CAST(0 AS BIGINT)))
  FROM (
    SELECT t.i AS pos, sum(y * xi[t.i]) AS s
    FROM viol{t}, generate_series(1, {dim1}) t(i)
    GROUP BY t.i
  )
), w{t}(w) AS MATERIALIZED (
  SELECT list_transform(generate_series(1, {dim1}),
      i -> {coef!r} * w[i] + ({eta!r} / n) * (g[i] / {VEC_SCALE}))
  FROM w{t - 1}, g{t}, nn
)""")
    return (
        "WITH " + ",\n".join(parts) + f""",
final(wq) AS (
  SELECT list_transform(w, x -> CAST(floor(x * {W_SCALE} + 0.5) AS BIGINT))
  FROM w{SVM_ITERS}
)
SELECT v.vec_id, v.y,
       CAST(list_sum(list_transform(generate_series(1, {dim1}),
            i -> v.xi[i] * wq[i])) AS BIGINT) AS score_int,
       CASE WHEN list_sum(list_transform(generate_series(1, {dim1}),
            i -> v.xi[i] * wq[i])) >= 0 THEN 1 ELSE -1 END AS predicted,
       (CASE WHEN list_sum(list_transform(generate_series(1, {dim1}),
            i -> v.xi[i] * wq[i])) >= 0 THEN 1 ELSE -1 END)
         = v.y AS correct
FROM v, final
""")



# ---------------------------------------------------------------------------
# Distributed k-means over the embeddings corpus — the clustering step a
# training-data pipeline runs for corpus curation / diversity balancing
# (and the unsupervised sibling of classify_centroid above).  Fully
# deterministic fixed-point Lloyd's:
#
# - vectors quantized to int64 (the proven VEC_SCALE spelling);
# - init = the k lowest vec_ids' vectors (rank order, no RNG);
# - each iteration: ONE broadcast join (k*dim centroid rows) + argmin
#   with (dist, cluster) tie-break + ONE groupBy for the floored-mean
#   update.  The driver holds only k*dim integers between iterations;
#   empty clusters keep their previous centroid;
# - every arithmetic step (integer squared distances, floor(sum/n)
#   means) is replayed bit-for-bit by the unrolled DuckDB oracle.
#
# 100 TB shape: per iteration the corpus is scanned once; the shuffle
# carries (vec_id, cluster, dist) for the argmin window and (cluster, i,
# partial-sum) for the map-side-combined centroid update — both bounded
# by k, never by corpus width.

KMEANS_K = 8
KMEANS_ITERS = 3
_KM_DIM = 64


def kmeans_fit(q: DataFrame) -> DataFrame:
    """Distributed Lloyd's over quantized vectors ``(vec_id, qv)`` →
    final assignment ``(vec_id, qv, cluster, dist)``; deterministic
    (lowest-id init, exact int64 distances, lowest-cluster tie-break),
    so the DuckDB oracle replays it CTE-for-iteration.  Factored out in
    round 4 so semantic dedup (SemDeDup) reuses the same fit."""
    # init: the k lowest vec_ids' vectors, cluster = rank-1
    init = (
        q.orderBy("vec_id").limit(KMEANS_K).collect()
    )
    cent = np.array([r.qv for r in init], dtype=np.int64)  # k x dim

    # Per iteration ONE Arrow pass computes every point's (cluster,
    # dist) against the k x dim broadcast matrix — exact int64 squared
    # distances, argmin ties resolved to the lowest cluster (numpy
    # argmin picks the first maximum-tie, clusters are row-ordered).
    # The O(n*dim*k) work stays inside vectorized numpy instead of a
    # k-way row blowup through a shuffle.
    assign = None
    for _ in range(KMEANS_ITERS):
        def make_assign(c_mat):
            @F.pandas_udf("struct<cluster: long, dist: long>")
            def assign_udf(qv: pd.Series) -> pd.DataFrame:
                if len(qv) == 0:
                    return pd.DataFrame({"cluster": [], "dist": []})
                x = np.array(qv.tolist(), dtype=np.int64)  # b x dim
                # (b, k) exact int64: sum((x - c)^2) per candidate
                d = (
                    (x * x).sum(axis=1)[:, None]
                    - 2 * (x @ c_mat.T)
                    + (c_mat * c_mat).sum(axis=1)[None, :]
                )
                best = d.argmin(axis=1)
                return pd.DataFrame(
                    {"cluster": best, "dist": d[np.arange(len(x)), best]}
                )

            return assign_udf

        a = q.select("vec_id", "qv", make_assign(cent)("qv").alias("a"))
        assign = a.select(
            "vec_id", "qv", F.col("a.cluster").alias("cluster"),
            F.col("a.dist").alias("dist"),
        )
        # floored-mean centroid update: one unpivot of the ASSIGNED rows
        # (O(n*dim), no k-fan-out), map-side combined
        newc = (
            assign.select(
                "cluster", F.posexplode("qv").alias("i", "val")
            )
            .groupBy("cluster", "i")
            .agg(
                F.floor(
                    F.sum("val").cast("double") / F.count(F.lit(1))
                ).cast("long").alias("cval")
            )
            .collect()
        )
        nxt = cent.copy()  # empty clusters keep their previous centroid
        for r in newc:
            nxt[r.cluster, r.i] = r.cval
        cent = nxt

    return assign


def kmeans_embeddings(spark, sf_dir: str) -> DataFrame:
    from facebook_presto_spark.plans.tpch import _t

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", _quantized(F.col("embedding")).alias("qv"))
    return (
        kmeans_fit(q).groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("dist").alias("inertia"),
        )
        .orderBy("cluster")
    )


def kmeans_assign_ctes() -> tuple[str, str]:
    """DuckDB CTE chain replaying ``kmeans_fit`` exactly; returns
    (sql starting at WITH, name of the final-assignment CTE) — shared
    by the kmeans oracle and the SemDeDup oracle (pipeline/dedup.py)."""
    sql, last = _kmeans_ctes_impl()
    return sql, last


def _kmeans_ctes_impl() -> tuple[str, str]:
    k, dim = KMEANS_K, _KM_DIM
    sql = f"""
WITH pts AS (
  SELECT vec_id, CAST(i AS INTEGER) AS i,
         CAST(round(CAST(embedding[i+1] AS DOUBLE) * {VEC_SCALE}) AS BIGINT) AS val
  FROM embeddings, range({dim}) t(i)
), init AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
), c0 AS (
  SELECT init.cluster, pts.i, pts.val AS cval
  FROM init JOIN pts USING (vec_id)
)"""
    prev = "c0"
    for t in range(KMEANS_ITERS):
        sql += f""", d{t} AS (
  SELECT p.vec_id, c.cluster,
         CAST(sum((p.val - c.cval) * (p.val - c.cval)) AS BIGINT) AS dist
  FROM pts p JOIN {prev} c USING (i)
  GROUP BY p.vec_id, c.cluster
), s{t} AS (
  SELECT vec_id, cluster, dist FROM (
    SELECT vec_id, cluster, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
    FROM d{t}
  ) WHERE rn = 1
), cn{t} AS (
  SELECT s.cluster, p.i,
         CAST(floor(CAST(sum(p.val) AS DOUBLE) / count(*)) AS BIGINT) AS cval
  FROM s{t} s JOIN pts p USING (vec_id)
  GROUP BY s.cluster, p.i
), c{t + 1} AS (
  SELECT c.cluster, c.i, COALESCE(n.cval, c.cval) AS cval
  FROM {prev} c LEFT JOIN cn{t} n ON n.cluster = c.cluster AND n.i = c.i
)"""
        prev = f"c{t + 1}"
    return sql, f"s{KMEANS_ITERS - 1}"


def _kmeans_oracle_sql() -> str:
    ctes, assign = kmeans_assign_ctes()
    return ctes + f"""
SELECT cluster, count(*) AS n_points, CAST(sum(dist) AS BIGINT) AS inertia
FROM {assign}
GROUP BY cluster
ORDER BY cluster
"""

# ---------------------------------------------------------------------------
# Exact C-SVC via SMO (pipeline/svm_smo.py) — the reference's actual
# solver algorithm (AbstractSvmModel.java:112 → libsvm svm_train).  The
# reference's learn aggregations are decomposable=false, i.e. they train
# on ONE node over the collected features; learn_svm_smo mirrors that
# execution model (driver-side solve, distributed classify against the
# broadcast model).  The distributed Pegasos path above remains the
# 100-TB training story.


def learn_svm_smo(df: DataFrame, x_cols: list[str], y_col: str,
                  params: str = "") -> dict:
    """Collect (features, label∈{+1,−1}) and solve the C-SVC dual with
    the libsvm algorithm (LibSvmUtils defaults: linear, C=1, eps=0.1
    unless overridden by the libsvm param string)."""
    import numpy as np

    from facebook_presto_spark.pipeline.svm_smo import (
        parse_libsvm_params,
        smo_train,
    )

    p = parse_libsvm_params(params)
    rows = df.select(*x_cols, y_col).collect()
    X = np.array([[float(r[c]) for c in x_cols] for r in rows])
    y = np.array([float(r[y_col]) for r in rows])
    return smo_train(
        X, y, C=p["C"], eps=p["eps"], kernel=p["kernel"],
        gamma=p.get("gamma"), degree=p.get("degree", 3),
        coef0=p.get("coef0", 0.0),
    )


def svm_classifier_smo(spark, sf_dir: str) -> DataFrame:
    """End-to-end exact-SMO classification with an analytic oracle.

    The training set is synthesized from embeddings keys so the 1-D
    max-margin solution is known in closed form: x1 lies in [0, 5) for
    y = −1 and in [7, 12) for y = +1 (x2 ≡ 0), so the unique solution
    is w1 = 2/(min₊ − max₋), rho = w1·(min₊ + max₋)/2 and every point
    classifies correctly.  The DuckDB oracle derives the same values
    from the data with interval arithmetic — a genuine independent
    check of solver + classify, while the solver's own contract (KKT
    within eps, libsvm rho rule, analytic alphas) is pinned in
    tests/test_svm_smo.py."""
    from facebook_presto_spark.plans.tpch import _t

    emb = _t(spark, sf_dir, "embeddings")
    y = F.when(F.col("vec_id") % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    x1 = ((F.col("vec_id") * 7919) % 500) / F.lit(100.0) + F.when(
        y > 0, F.lit(7.0)
    ).otherwise(F.lit(0.0))
    base = emb.select(
        F.col("vec_id"), y.alias("y"), x1.alias("x1"), F.lit(0.0).alias("x2")
    )
    model = learn_svm_smo(base, ["x1", "x2"], "y", "kernel=linear,C=1,eps=1e-6")
    w1 = float(model["w"][0])
    rho = float(model["rho"])
    score = F.col("x1") * F.lit(w1) - F.lit(rho)
    pred = F.when(score > 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    return (
        base.select("y", pred.alias("pred"))
        .groupBy("y")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("pred") == F.col("y"), F.lit(1))).alias(
                "n_correct"
            ),
            F.round(F.lit(w1), 4).alias("w1"),
            F.round(F.lit(rho), 4).alias("rho"),
        )
        .orderBy("y")
    )


ML_SVM_SMO_SQL = """
WITH base AS (
  SELECT CASE WHEN vec_id % 2 = 0 THEN 1.0 ELSE -1.0 END AS y,
         ((vec_id * 7919) % 500) / 100.0
           + CASE WHEN vec_id % 2 = 0 THEN 7.0 ELSE 0.0 END AS x1
  FROM embeddings
), bounds AS (
  SELECT max(CASE WHEN y < 0 THEN x1 END) AS lo,
         min(CASE WHEN y > 0 THEN x1 END) AS hi
  FROM base
)
SELECT y, count(*) AS n, count(*) AS n_correct,
       round(2.0 / (hi - lo), 4) AS w1,
       round((hi + lo) / (hi - lo), 4) AS rho
FROM base, bounds
GROUP BY y, lo, hi ORDER BY y
"""


QUERIES = {
    "ml_linear_regression": linear_regression,
    "ml_classify_centroid": classify_centroid,
    "ml_svm_classifier": svm_classifier,
    "ml_svm_smo": svm_classifier_smo,
    "ml_kmeans_embeddings": kmeans_embeddings,
}

ORACLE = {
    "ml_linear_regression": ML_LINEAR_REGRESSION_SQL,
    "ml_classify_centroid": ML_CLASSIFY_CENTROID_SQL,
    "ml_svm_classifier": _svm_oracle_sql(),
    "ml_svm_smo": ML_SVM_SMO_SQL,
    "ml_kmeans_embeddings": _kmeans_oracle_sql(),
}
