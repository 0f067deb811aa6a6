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


# --- SQL-surface learn/classify/regress (round 4: real libsvm-algorithm
# training behind the reference's own SQL spelling) -------------------------

@pytest.fixture(scope="module")
def ml_engine(spark, sf_dir):
    from facebook_presto_spark.engine import PrestoSparkEngine

    return PrestoSparkEngine.for_dir(sf_dir, spark=spark)


def test_ml_sql_reference_queries(ml_engine):
    """The reference's own TestMLQueries.java:40-48 SQL, verbatim."""
    r = ml_engine.sql(
        "SELECT classify(features(1, 2), model) "
        "FROM (SELECT learn_classifier(labels, features) AS model "
        "FROM (VALUES (1, features(1, 2))) t(labels, features)) t2"
    ).collect()
    assert r[0][0] == "1"  # classify returns VARCHAR (documented erasure)
    r = ml_engine.sql(
        "SELECT classify(features(1, 2), model) "
        "FROM (SELECT learn_classifier(labels, features) AS model "
        "FROM (VALUES ('cat', features(1, 2))) t(labels, features)) t2"
    ).collect()
    assert r[0][0] == "cat"


def test_ml_sql_multiclass_one_vs_one(ml_engine):
    r = ml_engine.sql(
        "SELECT classify(features(9.0, 9.0), model) AS far, "
        "classify(features(0.1, 0.2), model) AS near, "
        "classify(features(5.1, 4.9), model) AS mid "
        "FROM (SELECT learn_classifier(labels, features) AS model "
        "FROM (VALUES "
        "(0, features(0.0, 0.0)), (0, features(0.2, 0.1)), "
        "(1, features(5.0, 5.0)), (1, features(5.2, 5.1)), "
        "(2, features(9.0, 8.8)), (2, features(8.8, 9.1))"
        ") t(labels, features)) m"
    ).collect()
    assert (r[0]["far"], r[0]["near"], r[0]["mid"]) == ("2", "0", "1")


def test_ml_sql_regressor_svr_tube(ml_engine):
    # y = 2x: the epsilon-SVR fit predicts within the 0.1 tube of the
    # true line (plus the minimal-norm slope shrink)
    r = ml_engine.sql(
        "SELECT regress(features(3.0), model) AS p "
        "FROM (SELECT learn_regressor(labels, features) AS model "
        "FROM (VALUES (0.0, features(0.0)), (2.0, features(1.0)), "
        "(4.0, features(2.0)), (8.0, features(4.0))) t(labels, features)) t2"
    ).collect()
    assert abs(r[0]["p"] - 6.0) < 0.3


def test_ml_sql_libsvm_params_rbf_xor(ml_engine):
    r = ml_engine.sql(
        "SELECT classify(features(0, 1), model) AS a, "
        "classify(features(1, 1), model) AS b "
        "FROM (SELECT learn_libsvm_classifier(labels, features, "
        "'kernel=rbf,C=100') AS model "
        "FROM (VALUES (1, features(0, 0)), (1, features(1, 1)), "
        "(0, features(0, 1)), (0, features(1, 0))) t(labels, features)) t2"
    ).collect()
    assert (r[0]["a"], r[0]["b"]) == ("0", "1")


def test_ml_dataframe_path_matches_sql(spark):
    """call('learn_classifier', …) through the registry equals the SQL
    spelling on the same data."""
    df = spark.createDataFrame(
        [(0, {0: 0.0, 1: 0.0}), (0, {0: 0.3, 1: 0.1}),
         (1, {0: 4.0, 1: 4.2}), (1, {0: 4.4, 1: 4.1})],
        "label bigint, fv map<bigint,double>",
    )
    model = df.agg(
        call("learn_classifier", F.col("label"), F.col("fv")).alias("m")
    )
    pred = (
        df.crossJoin(model)
        .select(call("classify", F.col("fv"), F.col("m")).alias("p"), "label")
        .collect()
    )
    assert all(r["p"] == str(r["label"]) for r in pred)


def test_svr_analytic_minimal_norm():
    """The 2-point epsilon-SVR has a closed form: w = 2 − 2ε, b = ε."""
    from facebook_presto_spark.pipeline.svm_smo import smo_predict, svr_train

    m = svr_train([[0.0], [1.0]], [0.0, 2.0], C=100.0, eps=1e-8, epsilon=0.1)
    assert m["w"][0] == pytest.approx(1.8, abs=1e-6)
    assert -m["rho"] == pytest.approx(0.1, abs=1e-6)
    assert smo_predict(m, [[0.5]])[0] == pytest.approx(1.0, abs=1e-6)
