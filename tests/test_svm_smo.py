"""C-SVC SMO solver contract tests (no Spark).

The reference trains via libsvm's svm_train (AbstractSvmModel.java:112,
defaults LibSvmUtils.java:33-41); the libsvm binary is not present in
this environment, so these tests pin the mathematical contract the
solver shares with it: analytic max-margin solutions, the eps-KKT
stopping rule (m(a) - M(a) <= eps), box/equality feasibility, the
calculate_rho rule, and kernel behavior.
"""

import math

import numpy as np
import pytest

from facebook_presto_spark.pipeline.svm_smo import (
    kkt_violation,
    parse_libsvm_params,
    smo_predict,
    smo_train,
)


def test_two_point_analytic():
    # min ||w||^2/2 s.t. y w.x >= 1 for x = (+-1, 0) → w = (1, 0),
    # rho = 0, alpha = (1/2, 1/2)
    m = smo_train([[1.0, 0.0], [-1.0, 0.0]], [1.0, -1.0], C=1.0, eps=1e-8)
    assert m["w"] == pytest.approx([1.0, 0.0], abs=1e-8)
    assert m["rho"] == pytest.approx(0.0, abs=1e-8)
    assert m["alpha"] == pytest.approx([0.5, 0.5], abs=1e-8)


def test_four_point_analytic_margin():
    # closest pair (2,0) vs (0,0) → separating plane x = 1:
    # w = (1, 0), rho = 1; the outer points are not support vectors
    X = [[2.0, 0.0], [3.0, 1.0], [0.0, 0.0], [-1.0, 1.0]]
    y = [1.0, 1.0, -1.0, -1.0]
    m = smo_train(X, y, C=10.0, eps=1e-8)
    assert m["w"] == pytest.approx([1.0, 0.0], abs=1e-7)
    assert m["rho"] == pytest.approx(1.0, abs=1e-7)
    assert np.sign(smo_predict(m, X)).tolist() == y
    assert m["alpha"][1] == pytest.approx(0.0, abs=1e-9)
    assert m["alpha"][3] == pytest.approx(0.0, abs=1e-9)


def test_kkt_and_feasibility_random():
    rng = np.random.RandomState(7)
    X = rng.randn(300, 6)
    y = np.sign(X[:, 0] + 0.4 * rng.randn(300))
    y[y == 0] = 1.0
    m = smo_train(X, y, C=1.0, eps=0.1)
    # the libsvm stopping contract
    assert kkt_violation(m, X, y) <= 0.1 + 1e-9
    # box and equality constraints
    assert (m["alpha"] >= -1e-9).all() and (m["alpha"] <= 1.0 + 1e-9).all()
    assert float(m["alpha"] @ y) == pytest.approx(0.0, abs=1e-9)
    # a non-trivial classifier on strongly linear data
    acc = (np.sign(smo_predict(m, X)) == y).mean()
    assert acc > 0.75


def test_objective_not_worse_than_pegasos_style_w():
    """The dual optimum's primal objective beats any subgradient-descent
    iterate's: the solver really optimizes, not just separates."""
    rng = np.random.RandomState(3)
    X = rng.randn(150, 4)
    y = np.sign(X @ np.array([1.0, -2.0, 0.5, 0.0]) + 0.3 * rng.randn(150))
    y[y == 0] = 1.0
    C = 1.0
    m = smo_train(X, y, C=C, eps=1e-4)

    def primal(w, b):
        margins = y * (X @ w - b)
        return 0.5 * float(w @ w) + C * float(np.maximum(0, 1 - margins).sum())

    # crude subgradient iterate
    w, b = np.zeros(4), 0.0
    for t in range(1, 200):
        marg = y * (X @ w - b)
        viol = marg < 1
        g = w - C * (y[viol][:, None] * X[viol]).sum(axis=0)
        gb = C * y[viol].sum()
        lr = 1.0 / t
        w, b = w - lr * g, b - lr * gb
    assert primal(m["w"], m["rho"]) <= primal(w, b) + 1e-6


def test_rbf_solves_xor():
    X = [[0.0, 0.0], [1.0, 1.0], [0.0, 1.0], [1.0, 0.0]]
    y = [1.0, 1.0, -1.0, -1.0]
    m = smo_train(X, y, C=100.0, eps=1e-6, kernel="rbf", gamma=1.0)
    assert np.sign(smo_predict(m, X)).tolist() == y


def test_polynomial_and_sigmoid_run():
    rng = np.random.RandomState(11)
    X = rng.randn(60, 3)
    y = np.sign(X[:, 0] * X[:, 1] + 0.1)
    y[y == 0] = 1.0
    for kern in ("polynomial", "sigmoid"):
        m = smo_train(X, y, C=1.0, eps=0.1, kernel=kern, gamma=0.5)
        assert kkt_violation(m, X, y) <= 0.1 + 1e-9
        assert len(smo_predict(m, X)) == 60


def test_soft_margin_bounds_alphas_at_C():
    # overlapping classes force bound support vectors
    X = [[1.0], [0.9], [-1.0], [-0.9], [-0.5], [0.5]]
    y = [1.0, 1.0, -1.0, -1.0, 1.0, -1.0]  # last two are mislabeled
    C = 0.7
    m = smo_train(X, y, C=C, eps=1e-8)
    assert m["alpha"].max() <= C + 1e-12
    # the mislabeled points are bound at C
    assert m["alpha"][4] == pytest.approx(C)
    assert m["alpha"][5] == pytest.approx(C)


def test_rho_rule_no_free_svs():
    # both alphas at the C bound → rho = midpoint of the violated
    # gradient bounds (calculate_rho's ub/lb branch)
    m = smo_train([[0.1, 0.0], [-0.1, 0.0]], [1.0, -1.0], C=1.0, eps=1e-8)
    assert m["alpha"] == pytest.approx([1.0, 1.0])
    assert m["rho"] == pytest.approx(0.0, abs=1e-9)


def test_parse_libsvm_params():
    p = parse_libsvm_params("")
    assert p == {"kernel": "linear", "C": 1.0, "eps": 0.1}
    p = parse_libsvm_params("kernel=rbf,C=2.5,gamma=0.1,eps=0.01")
    assert p["kernel"] == "rbf" and p["C"] == 2.5
    assert p["gamma"] == 0.1 and p["eps"] == 0.01
    with pytest.raises(ValueError, match="Unknown kernel"):
        parse_libsvm_params("kernel=quantum")
    with pytest.raises(ValueError, match="Unknown parameter"):
        parse_libsvm_params("shrinking=1")


def test_determinism():
    rng = np.random.RandomState(5)
    X = rng.randn(100, 3)
    y = np.sign(X[:, 0])
    y[y == 0] = 1.0
    m1 = smo_train(X, y, C=1.0, eps=0.01)
    m2 = smo_train(X, y, C=1.0, eps=0.01)
    assert np.array_equal(m1["alpha"], m2["alpha"])
    assert m1["rho"] == m2["rho"]


def test_labels_validated():
    with pytest.raises(ValueError, match="labels"):
        smo_train([[1.0]], [2.0])
    with pytest.raises(ValueError, match="labels"):
        smo_train(np.zeros((0, 2)), [])
