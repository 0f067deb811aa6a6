"""ML scalar functions (presto-ml plugin).

Reference: presto-ml/.../MLFeaturesFunctions.java — ``features(x0, x1, …)``
builds the map<bigint,double> feature vector consumed by learn_*/classify/
regress.  The model-producing aggregations live in
facebook_presto_spark.pipeline.ml (they are relational operators, not
scalars).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from facebook_presto_spark.functions.registry import register


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


@register("features")
def features(*cols) -> Column:
    keys = F.array(*[F.lit(i).cast("bigint") for i in range(len(cols))])
    vals = F.array(*[_c(c).cast("double") for c in cols])
    return F.map_from_arrays(keys, vals)


# --------------------------------------------------------------------------
# SQL-surface learn/classify/regress (MLFunctions.java:41-76,
# LearnClassifierAggregation.java / LearnRegressorAggregation.java /
# LearnLibSvm*Aggregation.java / LibSvmUtils.java)
#
# The reference's learn aggregations are ``decomposable = false`` —
# they train single-node over the collected feature vectors — so the
# Spark spelling is collect_list + one training UDF, then a broadcast-
# friendly model string that classify()/regress() consume per row.
# Training is the real libsvm algorithm (pipeline/svm_smo.py — SMO for
# C-SVC, the tiled 2n dual for epsilon-SVR, one-vs-one voting for
# multiclass like svm_train); the model carrier is a VARCHAR JSON
# instead of the reference's varbinary slice (documented representation
# divergence — the model is opaque in both).  classify() always returns
# VARCHAR (the reference types the result by the model's label type;
# one registered SQL name cannot dispatch statically — numeric labels
# render as digits, documented).


def _features_matrix(maps, dim):
    import numpy as np

    X = np.zeros((len(maps), dim))
    for r, fmap in enumerate(maps):
        if fmap is None:
            continue
        for k, v in dict(fmap).items():
            k = int(k)
            if 0 <= k < dim:
                X[r, k] = float(v)
    return X


def _train_classifier_model(labels, fmaps, params_str):
    import json

    import numpy as np

    from facebook_presto_spark.pipeline.svm_smo import (
        parse_libsvm_params,
        smo_train,
    )

    p = parse_libsvm_params(params_str or "")
    dim = 1 + max(
        (int(k) for fmap in fmaps if fmap for k in dict(fmap)), default=-1
    )
    X = _features_matrix(fmaps, max(dim, 1))
    classes = sorted(set(labels), key=lambda v: (str(type(v)), v))
    pairs = []
    for a in range(len(classes)):
        for b in range(a + 1, len(classes)):
            mask = [lab in (classes[a], classes[b]) for lab in labels]
            Xp = X[np.array(mask)]
            yp = np.array(
                [1.0 if lab == classes[a] else -1.0
                 for lab, m in zip(labels, mask) if m]
            )
            m = smo_train(
                Xp, yp, C=p["C"], eps=p["eps"], kernel=p["kernel"],
                gamma=p.get("gamma"), degree=p.get("degree", 3),
                coef0=p.get("coef0", 0.0),
            )
            pairs.append({
                "a": a, "b": b, "rho": m["rho"],
                "sv_x": m["sv_x"].tolist(),
                "sv_coef": m["sv_coef"].tolist(),
            })
    return json.dumps({
        "type": "classifier",
        "labels": [str(c) for c in classes],
        "dim": max(dim, 1),
        "kernel": p["kernel"],
        "params": {k: p[k] for k in p if k not in ("C", "eps")},
        "pairs": pairs,
    })


def _train_regressor_model(targets, fmaps, params_str):
    import json

    from facebook_presto_spark.pipeline.svm_smo import (
        parse_libsvm_params,
        svr_train,
    )

    p = parse_libsvm_params(params_str or "")
    dim = 1 + max(
        (int(k) for fmap in fmaps if fmap for k in dict(fmap)), default=-1
    )
    X = _features_matrix(fmaps, max(dim, 1))
    m = svr_train(
        X, [float(t) for t in targets], C=p["C"], eps=p["eps"],
        kernel=p["kernel"], gamma=p.get("gamma"),
        degree=p.get("degree", 3), coef0=p.get("coef0", 0.0),
    )
    return json.dumps({
        "type": "regressor",
        "dim": max(dim, 1),
        "kernel": p["kernel"],
        "params": {k: p[k] for k in p if k not in ("C", "eps")},
        "rho": m["rho"],
        "sv_x": m["sv_x"].tolist(),
        "sv_coef": m["sv_coef"].tolist(),
    })


def _eval_model(model, X):
    import numpy as np

    from facebook_presto_spark.pipeline.svm_smo import _kernel

    def decision(sv_x, sv_coef, rho):
        if not sv_x:
            return np.full(len(X), -rho)
        K = _kernel(
            {"kernel": model["kernel"], **model.get("params", {})},
            X, np.asarray(sv_x, dtype=float),
        )
        return K @ np.asarray(sv_coef, dtype=float) - rho

    if model["type"] == "regressor":
        return decision(model["sv_x"], model["sv_coef"], model["rho"])
    votes = np.zeros((len(X), len(model["labels"])), dtype=int)
    if len(model["labels"]) == 1:
        votes[:, 0] = 1
    for pair in model["pairs"]:
        f = decision(pair["sv_x"], pair["sv_coef"], pair["rho"])
        votes[f > 0, pair["a"]] += 1
        votes[f <= 0, pair["b"]] += 1
    idx = votes.argmax(axis=1)
    return np.array([model["labels"][i] for i in idx], dtype=object)


def _learn_udf(trainer):
    import pandas as pd
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def learn(rows, params):
        out = []
        for arr, ps in zip(rows, params):
            if arr is None or len(arr) == 0:
                out.append(None)
                continue
            labels = [r["l"] for r in arr]
            fmaps = [r["f"] for r in arr]
            out.append(trainer(labels, fmaps, ps))
        return pd.Series(out)

    return learn


def _apply_udf(out_type):
    import json

    import pandas as pd
    from pyspark.sql.types import DoubleType, StringType

    @F.pandas_udf(DoubleType() if out_type == "double" else StringType())
    def apply_model(fmap_col, model_col):
        models = {}
        out = []
        rows = list(zip(fmap_col, model_col))
        for fmap, mjson in rows:
            if mjson is None or fmap is None:
                out.append(None)
                continue
            if mjson not in models:
                models[mjson] = json.loads(mjson)
            model = models[mjson]
            x = _features_matrix([fmap], model["dim"])
            v = _eval_model(model, x)[0]
            out.append(float(v) if out_type == "double" else str(v))
        return pd.Series(out)

    return apply_model


@register("learn_classifier")
def learn_classifier(label, features_col, params=None) -> Column:
    return _learn_udf(_train_classifier_model)(
        F.collect_list(F.struct(_c(label).alias("l"), _c(features_col).alias("f"))),
        F.first(F.lit("" if params is None else params)),
    )


@register("learn_libsvm_classifier")
def learn_libsvm_classifier(label, features_col, params) -> Column:
    return _learn_udf(_train_classifier_model)(
        F.collect_list(F.struct(_c(label).alias("l"), _c(features_col).alias("f"))),
        F.first(F.lit(params) if isinstance(params, str) else _c(params)),
    )


@register("learn_regressor")
def learn_regressor_fn(label, features_col, params=None) -> Column:
    return _learn_udf(_train_regressor_model)(
        F.collect_list(
            F.struct(_c(label).cast("double").alias("l"), _c(features_col).alias("f"))
        ),
        F.first(F.lit("" if params is None else params)),
    )


@register("learn_libsvm_regressor")
def learn_libsvm_regressor(label, features_col, params) -> Column:
    return _learn_udf(_train_regressor_model)(
        F.collect_list(
            F.struct(_c(label).cast("double").alias("l"), _c(features_col).alias("f"))
        ),
        F.first(F.lit(params) if isinstance(params, str) else _c(params)),
    )


@register("classify")
def classify_fn(features_col, model) -> Column:
    return _apply_udf("string")(_c(features_col), _c(model))


@register("regress")
def regress_fn(features_col, model) -> Column:
    return _apply_udf("double")(_c(features_col), _c(model))


# SQL-path twins (engine._register_sql_udfs): the aggregate spelling is
# produced by sqlfront rewrite rules (learn_classifier(l, f) →
# ml_learn_classifier(collect_list(named_struct('l', l, 'f', f)), ''))
SQL_UDFS = {
    "ml_learn_classifier": _learn_udf(_train_classifier_model),
    "ml_learn_regressor": _learn_udf(_train_regressor_model),
    "classify": _apply_udf("string"),
    "regress": _apply_udf("double"),
}
