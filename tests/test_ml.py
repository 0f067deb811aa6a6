"""presto-ml surface: features / learn_regressor / regress /
learn_classifier / classify (MLFunctions.java, MLFeaturesFunctions.java —
API parity with a distributed-training model substituted for the
reference's single-node libsvm SVM)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facebook_presto_spark.functions import call
from facebook_presto_spark.pipeline.ml import (
    classify,
    learn_classifier,
    learn_regressor,
    regress,
)


def test_features_map(spark):
    row = spark.range(1).select(call("features", F.lit(3), F.lit(5.5))).first()
    assert row[0] == {0: 3.0, 1: 5.5}


def test_learn_regressor_exact_line(spark):
    # y = 7x + 3 exactly → slope/intercept recovered, r2 = 1
    df = spark.createDataFrame([(x, 7 * x + 3) for x in range(1, 30)], "x long, y long")
    m = learn_regressor(df, F.col("y"), F.col("x")).first()
    assert m["slope"] == pytest.approx(7.0)
    assert m["intercept"] == pytest.approx(3.0)
    assert m["r2"] == pytest.approx(1.0)


def test_regress_applies_model(spark):
    df = spark.createDataFrame([(x, 2 * x) for x in range(1, 20)], "x long, y long")
    model = learn_regressor(df, F.col("y"), F.col("x"))
    pred = regress(spark.createDataFrame([(100,)], "x long"), model, F.col("x")).first()
    assert pred["prediction"] == pytest.approx(200.0)


def test_classifier_separable(spark):
    # two well-separated clusters → every point classified to its own label
    rows = [(i, [float(i % 7) * 0.01 + 10.0, 0.0], 1) for i in range(20)]
    rows += [(100 + i, [-10.0, float(i % 5) * 0.01], 2) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    model = learn_classifier(df, F.col("label"), F.col("embedding"), 2)
    assert model.count() == 2
    pred = classify(df, model, F.col("embedding"), "vec_id")
    joined = pred.join(df.select("vec_id", "label"), "vec_id")
    n_wrong = joined.filter(F.col("predicted") != F.col("label")).count()
    assert n_wrong == 0


def test_kmeans_partitions_and_converges(spark, sf_dir):
    from facebook_presto_spark.pipeline.ml import (
        KMEANS_K, kmeans_embeddings)

    out = kmeans_embeddings(spark, sf_dir).collect()
    assert 1 <= len(out) <= KMEANS_K
    n_emb = spark.read.parquet(sf_dir + "/embeddings.parquet").count()
    assert sum(r.n_points for r in out) == n_emb  # every point assigned once
    assert all(r.inertia >= 0 for r in out)
    # deterministic: a second run is identical
    again = kmeans_embeddings(spark, sf_dir).collect()
    assert out == again
