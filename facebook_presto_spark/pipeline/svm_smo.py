"""C-SVC dual solver with libsvm's algorithm, in NumPy.

Reference: presto-ml/.../AbstractSvmModel.java:112 delegates training
to ``libsvm.svm.svm_train`` (C-SVC defaults from LibSvmUtils.java:33-41
— LINEAR kernel, C=1, eps=0.1), and the learn_* aggregations are
``decomposable = false`` (LearnClassifierAggregation.java) — the
reference itself trains on ONE node over the collected feature
vectors.  This module implements the same published algorithm (SMO
with second-order working-set selection — Fan, Chen, Lin, JMLR 2005;
the algorithm in the libsvm paper) so the engine's learn_classifier /
learn_regressor model family solves the same dual problem to the same
eps-KKT stopping rule:

    min  1/2 a'Qa - e'a   s.t.  y'a = 0,  0 <= a_i <= C
    Q_ij = y_i y_j K(x_i, x_j)

The solution's (w, rho) — unique for the linear kernel — determine
predictions; tests pin analytic max-margin solutions and the KKT
residual.  libsvm's binary cannot be run in this environment, so
bit-level coefficient comparison is out of scope (documented, same
boundary as the qdigest wire format); the mathematical contract
(stationarity within eps, box/equality feasibility, rho rule) is
asserted instead.

Execution model parity: training runs driver-side over collected
features exactly like the reference's single-node aggregate; the
distributed full-batch Pegasos path in pipeline/ml.py remains the
100-TB training story, and classification always runs distributed
against the broadcast model either way.
"""

from __future__ import annotations

import math

import numpy as np

TAU = 1e-12


def _kernel(params: dict, X: np.ndarray, Z: np.ndarray) -> np.ndarray:
    """Gram matrix between rows of X and rows of Z, libsvm kernels."""
    kind = params.get("kernel", "linear")
    dots = X @ Z.T
    if kind == "linear":
        return dots
    gamma = params.get("gamma", 1.0 / max(X.shape[1], 1))
    if kind == "polynomial":
        degree = params.get("degree", 3)
        coef0 = params.get("coef0", 0.0)
        return (gamma * dots + coef0) ** degree
    if kind == "rbf":
        sq = (
            np.sum(X * X, axis=1)[:, None]
            + np.sum(Z * Z, axis=1)[None, :]
            - 2.0 * dots
        )
        return np.exp(-gamma * np.maximum(sq, 0.0))
    if kind == "sigmoid":
        coef0 = params.get("coef0", 0.0)
        return np.tanh(gamma * dots + coef0)
    raise ValueError(f"unsupported kernel: {kind}")


def _solve(K, y, p, C, eps, max_iter):
    """Generic SMO loop (libsvm runs ONE Solver for every svm type,
    parameterized by the linear term p and the +-1 vector y):

        min 1/2 b'Qb + p'b   s.t.  y'b = 0,  0 <= b_i <= C
        Q = (y y') ∘ K

    Returns (beta, G, rho, iterations)."""
    n = len(y)
    KD = np.diag(K).copy()
    Q = (y[:, None] * y[None, :]) * K
    alpha = np.zeros(n)
    G = np.asarray(p, dtype=np.float64).copy()  # gradient at b = 0

    it = 0
    while it < max_iter:
        it += 1
        # working-set selection (second order, WSS 2)
        yG = y * G
        up = ((y > 0) & (alpha < C - TAU)) | ((y < 0) & (alpha > TAU))
        low = ((y > 0) & (alpha > TAU)) | ((y < 0) & (alpha < C - TAU))
        if not up.any() or not low.any():
            break
        neg_yG = -yG
        i = int(np.flatnonzero(up)[np.argmax(neg_yG[up])])
        m = neg_yG[i]
        M = neg_yG[low].min()
        if m - M <= eps:
            break
        # second-order j: among I_low with -y_t G_t < m, minimize -b^2/a
        cand = low & (neg_yG < m - TAU)
        if not cand.any():
            cand = low
        b = m + yG[cand]  # > 0
        # quad coefficient is always K_ii + K_tt - 2 K_it: the label
        # signs cancel through Q (libsvm select_working_set)
        a = KD[i] + KD[cand] - 2.0 * K[i, cand]
        a = np.where(a > TAU, a, TAU)
        idxs = np.flatnonzero(cand)
        j = int(idxs[np.argmin(-(b * b) / a)])

        # two-variable update (libsvm Solver::solve inner step)
        a_ij = max(KD[i] + KD[j] - 2.0 * K[i, j], TAU)
        old_ai, old_aj = alpha[i], alpha[j]
        if y[i] != y[j]:
            delta = (-G[i] - G[j]) / a_ij
            diff = alpha[i] - alpha[j]
            alpha[i] += delta
            alpha[j] += delta
            if diff > 0:
                if alpha[j] < 0:
                    alpha[j] = 0.0
                    alpha[i] = diff
            else:
                if alpha[i] < 0:
                    alpha[i] = 0.0
                    alpha[j] = -diff
            if diff > 0:
                if alpha[i] > C:
                    alpha[i] = C
                    alpha[j] = C - diff
            else:
                if alpha[j] > C:
                    alpha[j] = C
                    alpha[i] = C + diff
        else:
            delta = (G[i] - G[j]) / a_ij
            s = alpha[i] + alpha[j]
            alpha[i] -= delta
            alpha[j] += delta
            if s > C:
                if alpha[i] > C:
                    alpha[i] = C
                    alpha[j] = s - C
            else:
                if alpha[j] < 0:
                    alpha[j] = 0.0
                    alpha[i] = s
            if s > C:
                if alpha[j] > C:
                    alpha[j] = C
                    alpha[i] = s - C
            else:
                if alpha[i] < 0:
                    alpha[i] = 0.0
                    alpha[j] = s
        d_i, d_j = alpha[i] - old_ai, alpha[j] - old_aj
        if d_i == 0.0 and d_j == 0.0:
            break
        G += Q[:, i] * d_i + Q[:, j] * d_j

    # rho (libsvm Solver::calculate_rho)
    yG = y * G
    free = (alpha > TAU) & (alpha < C - TAU)
    if free.any():
        rho = yG[free].mean()
    else:
        ub = math.inf
        lb = -math.inf
        for t in range(n):
            if (alpha[t] >= C - TAU and y[t] < 0) or (
                alpha[t] <= TAU and y[t] > 0
            ):
                ub = min(ub, yG[t])
            else:
                lb = max(lb, yG[t])
        rho = (ub + lb) / 2 if math.isfinite(ub) and math.isfinite(lb) else 0.0

    return alpha, G, float(rho), it


def smo_train(
    X,
    y,
    C: float = 1.0,
    eps: float = 0.1,
    kernel: str = "linear",
    gamma: float | None = None,
    degree: int = 3,
    coef0: float = 0.0,
    max_iter: int = 10_000_000,
):
    """Solve the C-SVC dual.  Returns a model dict with the support
    vectors, coefficients (alpha_i * y_i), rho, and — for the linear
    kernel — the primal weight vector ``w`` with decision function
    ``f(x) = w.x - rho``."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n == 0 or not (set(np.unique(y)) <= {-1.0, 1.0}):
        raise ValueError("labels must be +-1 and non-empty")
    params = {"kernel": kernel, "degree": degree, "coef0": coef0}
    if gamma is not None:
        params["gamma"] = gamma
    K = _kernel(params, X, X)
    alpha, G, rho, it = _solve(K, y, -np.ones(n), C, eps, max_iter)
    sv = alpha > TAU
    model = {
        "kernel": kernel,
        "params": params,
        "C": C,
        "eps": eps,
        "rho": rho,
        "sv_x": X[sv],
        "sv_coef": (alpha * y)[sv],
        "alpha": alpha,
        "iterations": it,
    }
    if kernel == "linear":
        model["w"] = (alpha * y) @ X
    return model


def svr_train(
    X,
    y,
    C: float = 1.0,
    eps: float = 0.1,
    epsilon: float = 0.1,
    kernel: str = "linear",
    gamma: float | None = None,
    degree: int = 3,
    coef0: float = 0.0,
    max_iter: int = 10_000_000,
):
    """Epsilon-SVR (the reference's SvmRegressor svm type): the 2n-
    variable dual

        min 1/2 (a-a*)'K(a-a*) + epsilon Σ(a+a*) - Σ y (a-a*)

    mapped onto the same generic solver libsvm uses — tiled kernel,
    y2 = [+1…, −1…], linear term [epsilon − y; epsilon + y].  The
    prediction is f(x) = Σ θ_i K(sv_i, x) − rho with θ = a − a*."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n == 0:
        raise ValueError("labels must be non-empty")
    params = {"kernel": kernel, "degree": degree, "coef0": coef0}
    if gamma is not None:
        params["gamma"] = gamma
    K = _kernel(params, X, X)
    K2 = np.block([[K, K], [K, K]])
    y2 = np.concatenate([np.ones(n), -np.ones(n)])
    p = np.concatenate([epsilon - y, epsilon + y])
    beta, G, rho, it = _solve(K2, y2, p, C, eps, max_iter)
    theta = beta[:n] - beta[n:]
    sv = np.abs(theta) > TAU
    model = {
        "kernel": kernel,
        "params": params,
        "C": C,
        "eps": eps,
        "epsilon": epsilon,
        "rho": rho,
        "sv_x": X[sv],
        "sv_coef": theta[sv],
        "theta": theta,
        "iterations": it,
    }
    if kernel == "linear":
        model["w"] = theta @ X
    return model


def smo_predict(model: dict, X) -> np.ndarray:
    """Decision values f(x) = sum_i coef_i K(sv_i, x) - rho; the
    predicted label is sign(f) (libsvm svm_predict)."""
    X = np.asarray(X, dtype=np.float64)
    if model["kernel"] == "linear":
        return X @ model["w"] - model["rho"]
    K = _kernel(model["params"], X, model["sv_x"])
    return K @ model["sv_coef"] - model["rho"]


def kkt_violation(model: dict, X, y) -> float:
    """m(a) - M(a): the stopping-rule residual.  <= eps after a
    successful solve (the libsvm convergence contract)."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    K = _kernel(model["params"], X, X)
    Q = (y[:, None] * y[None, :]) * K
    alpha = model["alpha"]
    C = model["C"]
    G = Q @ alpha - 1.0
    yG = y * G
    up = ((y > 0) & (alpha < C - TAU)) | ((y < 0) & (alpha > TAU))
    low = ((y > 0) & (alpha > TAU)) | ((y < 0) & (alpha < C - TAU))
    if not up.any() or not low.any():
        return 0.0
    return float((-yG[up]).max() - (-yG[low]).min())


def parse_libsvm_params(param_string: str) -> dict:
    """LibSvmUtils.parseParameters (:31-86): comma-separated key=value
    pairs over the libsvm names this solver supports."""
    out: dict = {"kernel": "linear", "C": 1.0, "eps": 0.1}
    if not param_string:
        return out
    kernels = {
        "linear": "linear",
        "poly": "polynomial",
        "polynomial": "polynomial",
        "rbf": "rbf",
        "sigmoid": "sigmoid",
    }
    for pair in param_string.split(","):
        if not pair.strip():
            continue
        key, _, value = pair.partition("=")
        key = key.strip().lower()
        value = value.strip()
        if key == "kernel":
            if value.lower() not in kernels:
                raise ValueError(f"Unknown kernel: {value}")
            out["kernel"] = kernels[value.lower()]
        elif key == "c":
            out["C"] = float(value)
        elif key == "eps" or key == "epsilon":
            out["eps"] = float(value)
        elif key == "gamma":
            out["gamma"] = float(value)
        elif key == "degree":
            out["degree"] = int(value)
        elif key == "coef0":
            out["coef0"] = float(value)
        else:
            raise ValueError(f"Unknown parameter: {key}")
    return out
