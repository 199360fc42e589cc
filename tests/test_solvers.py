"""Solver-family tests — the analogue of the reference's example suite
(ref minFunc_2012/example_minFunc.m: Rosenbrock over every method;
logisticExample/example_minFunc_LR.m + LogisticLoss.m)."""

import numpy as np
import pytest

from gpz_tpu.optim import (
    METHODS,
    armijo_backtrack,
    conj_grad,
    minimize_any,
    numerical_hvp,
)


def rosenbrock(x):
    f = 100 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2
    g = np.array([
        -400 * x[0] * (x[1] - x[0] ** 2) - 2 * (1 - x[0]),
        200 * (x[1] - x[0] ** 2),
    ])
    return f, g


def rosenbrock_h(x):
    f, g = rosenbrock(x)
    H = np.array([
        [1200 * x[0] ** 2 - 400 * x[1] + 2, -400 * x[0]],
        [-400 * x[0], 200.0],
    ])
    return f, g, H


def make_logistic(n=80, p=5, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, p))
    w_true = rng.standard_normal(p)
    y = np.sign(X @ w_true + 0.3 * rng.standard_normal(n))

    def loss(w):
        z = y * (X @ w)
        f = np.sum(np.logaddexp(0.0, -z)) + 0.5e-2 * w @ w
        s = 1.0 / (1.0 + np.exp(z))
        g = -(X.T @ (y * s)) + 1e-2 * w
        return f, g

    return loss, p


# newton needs the Hessian; sd/csd converge too slowly on Rosenbrock's
# curved valley to hit 1e-5 in a bounded budget — they get the easier
# quadratic/logistic checks below (as in the reference example, where the
# first-order methods are run with loose displays, example_minFunc.m:30-60).
ROSEN_METHODS = ["bb", "cg", "pcg", "lbfgs", "qnewton", "newton0"]


@pytest.mark.parametrize("method", ROSEN_METHODS)
def test_rosenbrock_all_methods(method):
    res = minimize_any(rosenbrock, np.array([-1.2, 1.0]), method=method,
                       max_iter=2000)
    assert res.f < 1e-8, (method, res.status, res.f)
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-3)


def test_rosenbrock_newton_exact():
    res = minimize_any(rosenbrock_h, np.array([-1.2, 1.0]), method="newton",
                       max_iter=100)
    assert res.f < 1e-8
    assert res.iterations < 40  # quadratic local convergence


def test_newton_hess_fun_kwarg():
    res = minimize_any(
        rosenbrock, np.array([-1.2, 1.0]), method="newton",
        hess_fun=lambda x: rosenbrock_h(x)[2], max_iter=100,
    )
    assert res.f < 1e-8


@pytest.mark.parametrize(
    "method",
    [m for m in METHODS if m not in ("newton", "mnewton", "tensor")],
)
def test_quadratic_all_methods(method):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((6, 6))
    A = A @ A.T + 0.5 * np.eye(6)
    b = rng.standard_normal(6)
    x_star = np.linalg.solve(A, b)

    def quad(x):
        return 0.5 * x @ A @ x - b @ x, A @ x - b

    res = minimize_any(quad, np.zeros(6), method=method, max_iter=3000)
    np.testing.assert_allclose(res.x, x_star, atol=1e-3)


@pytest.mark.parametrize("method", ["sd", "csd", "bb", "cg", "lbfgs",
                                    "newton0"])
def test_logistic_regression(method):
    loss, p = make_logistic()
    res = minimize_any(loss, np.zeros(p), method=method, max_iter=3000)
    # all methods agree on the strictly convex optimum
    ref = minimize_any(loss, np.zeros(p), method="lbfgs", max_iter=500)
    assert res.f <= ref.f + 1e-4, (method, res.status)


def test_scg_rosenbrock():
    """scg = CG with the Hessian-scaled initial step (ref
    minFunc_processInputOptions.m:98-101, minFunc.m:1001-1017)."""
    res = minimize_any(rosenbrock, np.array([-1.2, 1.0]), method="scg",
                       max_iter=2000)
    assert res.f < 1e-8, (res.status, res.f)
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-3)


def test_mnewton_rosenbrock():
    """mnewton = Newton with the Hessian reused for 5 iterations (ref
    minFunc_processInputOptions.m:77-79, minFunc.m:1041-1049): converges on
    Rosenbrock, with fewer Hessian evaluations than plain Newton."""
    h_evals = {"mnewton": 0, "newton": 0}

    def counting_hess(which):
        def h(x):
            h_evals[which] += 1
            return rosenbrock_h(x)[2]
        return h

    res_m = minimize_any(rosenbrock, np.array([-1.2, 1.0]), method="mnewton",
                         hess_fun=counting_hess("mnewton"), max_iter=200)
    res_n = minimize_any(rosenbrock, np.array([-1.2, 1.0]), method="newton",
                         hess_fun=counting_hess("newton"), max_iter=200)
    assert res_m.f < 1e-8, (res_m.status, res_m.f)
    # stale-Hessian reuse: at most ~1/5 of the per-iteration Hessian cost
    assert h_evals["mnewton"] <= h_evals["newton"]
    assert h_evals["mnewton"] <= res_m.iterations // 2 + 2


def test_tensor_rosenbrock():
    """tensor = 3rd-order Taylor-model steps with an inner Newton solve and
    eigen-step fallback (ref minFunc.m:932-959, taylorModel.m). Third-order
    information should reach the optimum in very few outer iterations."""
    res = minimize_any(rosenbrock, np.array([-1.2, 1.0]), method="tensor",
                       hess_fun=lambda x: rosenbrock_h(x)[2], max_iter=60)
    assert res.f < 1e-8, (res.status, res.f)
    assert res.iterations <= 40


def test_unknown_method_raises():
    with pytest.raises(ValueError):
        minimize_any(rosenbrock, np.zeros(2), method="adam")


def test_armijo_backtrack_sufficient_decrease():
    f0, g0 = rosenbrock(np.array([-1.2, 1.0]))
    d = -g0
    t, f, g, evals, failed = armijo_backtrack(
        rosenbrock, np.array([-1.2, 1.0]), f0, g0, d, 1.0, 1e-4, 25, 1e-9)
    assert not failed
    assert f <= f0 + 1e-4 * t * (g0 @ d)


def test_armijo_nonfinite_objective_backtracks():
    def fun(x):
        f = np.inf if x[0] > 0.5 else float(x @ x)
        return f, 2 * x

    x0 = np.array([0.4, 0.0])
    f0, g0 = fun(x0)
    d = np.array([1.0, 0.0])  # ascent into the inf region -> must fail
    t, f, g, evals, failed = armijo_backtrack(
        fun, x0, f0, g0, d, 1.0, 1e-4, 25, 1e-9)
    assert failed and t == 0.0


def test_conj_grad_solves_spd_system():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((8, 8))
    A = A @ A.T + np.eye(8)
    b = rng.standard_normal(8)
    d, iters = conj_grad(lambda v: A @ v, b, 1e-10, 100)
    np.testing.assert_allclose(d, np.linalg.solve(A, b), atol=1e-6)


def test_conj_grad_negative_curvature_falls_back():
    A = np.diag([-1.0, 1.0])
    b = np.array([1.0, 0.0])
    d, iters = conj_grad(lambda v: A @ v, b, 1e-10, 100)
    # first-iteration negative curvature -> steepest-descent direction b
    np.testing.assert_allclose(d, b)


def test_numerical_hvp_matches_exact():
    x = np.array([0.3, -0.7])
    v = np.array([0.5, 1.0])
    H = rosenbrock_h(x)[2]
    hv = numerical_hvp(rosenbrock, x, v)
    np.testing.assert_allclose(hv, H @ v, rtol=1e-5, atol=1e-5)


def test_trace_is_monotone_for_wolfe_methods():
    loss, p = make_logistic()
    res = minimize_any(loss, np.zeros(p), method="cg", max_iter=200)
    fs = [f for f, _ in res.trace]
    assert all(b <= a + 1e-12 for a, b in zip(fs, fs[1:]))
