"""L-BFGS unit tests (the reference's optimizer smoke tests, SURVEY §4.3:
Rosenbrock + quadratics + cross-check vs scipy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpz_tpu.optim import minimize
from gpz_tpu.optim.lbfgs import (
    STATUS_OPTIMAL,
    STATUS_STEP_TOO_SMALL,
    STATUS_EARLY_STOP,
)


def wrap(f):
    vg = jax.value_and_grad(f)

    def fun(x):
        v, g = vg(x)
        return v, g, ()

    return fun


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)


def test_quadratic_exact():
    A = jnp.diag(jnp.asarray([1.0, 10.0, 100.0]))
    b = jnp.asarray([1.0, -2.0, 3.0])
    fun = wrap(lambda x: 0.5 * x @ A @ x - b @ x)
    res = minimize(fun, jnp.zeros(3), max_iter=100)
    expect = jnp.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(expect), atol=1e-6)
    assert int(res.status) in (STATUS_OPTIMAL, STATUS_STEP_TOO_SMALL)


def test_rosenbrock_2d():
    res = minimize(wrap(rosenbrock), jnp.asarray([-1.2, 1.0]), max_iter=500)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-5)


def test_rosenbrock_10d():
    x0 = jnp.zeros(10)
    res = minimize(wrap(rosenbrock), x0, max_iter=1000)
    np.testing.assert_allclose(np.asarray(res.x), np.ones(10), atol=1e-4)
    assert float(res.f) < 1e-9


def test_matches_scipy_final_value(rng):
    """Same objective, comparable converged minimum as scipy L-BFGS-B."""
    from scipy.optimize import minimize as sp_minimize

    p = 20
    A = rng.standard_normal((p, p))
    Q = A @ A.T + np.eye(p)
    b = rng.standard_normal(p)

    def f_np(x):
        return 0.5 * x @ Q @ x - b @ x + 0.1 * np.sum(np.cos(x))

    Qj, bj = jnp.asarray(Q), jnp.asarray(b)
    fun = wrap(lambda x: 0.5 * x @ Qj @ x - bj @ x + 0.1 * jnp.sum(jnp.cos(x)))

    x0 = np.zeros(p)
    sp = sp_minimize(f_np, x0, jac=lambda x: Q @ x - b - 0.1 * np.sin(x), method="L-BFGS-B")
    res = minimize(fun, jnp.asarray(x0), max_iter=200)
    assert float(res.f) <= sp.fun + 1e-6


def test_logistic_regression(rng):
    """Ref minFunc logisticExample (SURVEY §4.3)."""
    n, p = 200, 5
    X = rng.standard_normal((n, p))
    w_true = rng.standard_normal(p)
    y = (X @ w_true + 0.5 * rng.standard_normal(n) > 0) * 2.0 - 1.0
    Xj, yj = jnp.asarray(X), jnp.asarray(y)

    def nll(w):
        return jnp.sum(jnp.logaddexp(0.0, -yj * (Xj @ w))) + 0.1 * w @ w

    res = minimize(wrap(nll), jnp.zeros(p), max_iter=200)
    g = jax.grad(lambda w: nll(w))(res.x)
    assert float(jnp.max(jnp.abs(g))) < 1e-4


def test_nan_objective_fallback():
    """Objective NaN away from a valid region: line search must backtrack
    (the reference's Armijo fallback, WolfeLineSearch.m:53-69)."""

    def f(x):
        v = jnp.where(x[0] > 2.0, jnp.nan, (x[0] - 1.9) ** 2)
        return jnp.sum(v)

    res = minimize(wrap(f), jnp.asarray([-4.0]), max_iter=100)
    np.testing.assert_allclose(np.asarray(res.x), [1.9], atol=1e-4)


def test_nonfinite_wall_makes_progress():
    """The r2 failure mode (VERDICT r2 weak #1): a quadratic behind a
    non-finite wall. Non-finite trials must backtrack (the reference's
    isLegal + ArmijoBacktrack recovery, WolfeLineSearch.m:53-69), NOT trip
    the zoom stall guard via the sentinel zeroed gradient — pre-fix this
    returned x0 unchanged with STATUS_LS_FAILED after 3 evals."""

    def f(x):
        ok = jnp.all(jnp.abs(x) <= 0.01)
        v = jnp.where(ok, 0.5 * jnp.sum((x - 5.0) ** 2), jnp.nan)
        g = jnp.where(ok, x - 5.0, jnp.nan)
        return v, g, ()

    res = minimize(f, jnp.zeros((1,)), max_iter=50)
    # converges to the wall boundary (the constrained optimum), not x0
    np.testing.assert_allclose(float(res.x[0]), 0.01, atol=1e-6)
    assert float(res.f) < 12.5  # strictly improved on f(x0)


def test_exp_overflow_recovers():
    """exp() overflow at bold trial steps — the mechanism that killed every
    long GPz run in r2 (beta/PHI exponentials, VERDICT r2 weak #1). The
    search must shrink the step and the run must end in a converged status."""

    def f(x):
        v = jnp.exp(50.0 * x[0]) - x[0]
        g = jnp.asarray([50.0 * jnp.exp(50.0 * x[0]) - 1.0])
        return v, g, ()

    res = minimize(f, jnp.asarray([5.0]), max_iter=200)
    assert int(res.status) in (STATUS_OPTIMAL, STATUS_STEP_TOO_SMALL)
    # optimum: 50 exp(50 x) = 1 -> x = ln(1/50)/50
    np.testing.assert_allclose(
        float(res.x[0]), float(np.log(1.0 / 50.0) / 50.0), atol=1e-5
    )


def test_memory_reset_after_soft_ls_failure():
    """A failed search with curvature memory resets the memory and retries
    from steepest descent instead of aborting (minFunc quits only once its
    Armijo fallback is exhausted). The iterate after recovery must keep
    improving."""

    # objective whose gradient goes non-finite on a thin shell, so a
    # quasi-Newton step across the shell fails but steepest descent from a
    # rescaled step survives
    def f(x):
        r = jnp.sum(x**2)
        v = 0.5 * jnp.sum((x - 2.0) ** 2)
        bad = (r > 0.9) & (r < 1.1)
        v = jnp.where(bad, jnp.nan, v)
        g = jnp.where(bad, jnp.nan, x - 2.0)
        return v, g, ()

    res = minimize(f, jnp.zeros((2,)), max_iter=100)
    # must have moved and improved, whatever the terminal status
    assert float(res.f) < 4.0 - 1e-6


def test_early_stopping_by_score():
    """Score that degrades after iteration 3 triggers early stop and best-x
    tracking (ref callBack.m:26-34)."""

    fun = wrap(lambda x: jnp.sum((x - 3.0) ** 2))

    def score_fn(x, aux):
        # reward being close to 1.0: best point en route to 3.0 is ~1
        s = -jnp.sum((x - 1.0) ** 2)
        return s, {"s": s}

    res = minimize(
        fun,
        jnp.zeros(4),
        max_iter=100,
        score_fn=score_fn,
        max_attempts=2,
    )
    assert int(res.status) == STATUS_EARLY_STOP or float(res.f) < 1e-10
    # best_x must score at least as well as the final iterate
    bs = -np.sum((np.asarray(res.x_best) - 1.0) ** 2)
    fs = -np.sum((np.asarray(res.x) - 1.0) ** 2)
    assert bs >= fs - 1e-12


def test_trace_recorded():
    fun = wrap(rosenbrock)
    res = minimize(fun, jnp.asarray([-1.2, 1.0]), max_iter=50)
    tr = res.trace
    n_it = int(res.iterations)
    f_trace = np.asarray(tr["f"])[: n_it + 1]
    assert np.all(np.isfinite(f_trace))
    # monotone non-increasing f along accepted iterates
    assert np.all(np.diff(f_trace) <= 1e-10)


def test_history_smaller_than_iters():
    """Circular buffer wrap-around correctness."""
    res = minimize(wrap(rosenbrock), jnp.zeros(6), max_iter=500, history=5)
    np.testing.assert_allclose(np.asarray(res.x), np.ones(6), atol=1e-4)


def test_patience_plateau_exit():
    """Noise-floor patience (minimize's `patience`/`patience_tol`): a huge
    tolerance turns every window into a plateau, so the loop must exit
    with STATUS_PLATEAU after exactly `patience` iterations; patience=0
    (the default) must leave the trajectory untouched."""
    from gpz_tpu.optim.lbfgs import STATUS_PLATEAU

    fun = wrap(rosenbrock)
    x0 = jnp.asarray([-1.2, 1.0])
    res = minimize(fun, x0, max_iter=500, patience=7, patience_tol=1e10)
    assert int(res.status) == STATUS_PLATEAU
    assert int(res.iterations) == 7

    # a tolerance below the per-window descent never fires on a healthy run
    ref = minimize(fun, x0, max_iter=500)
    res2 = minimize(fun, x0, max_iter=500, patience=25, patience_tol=1e-12)
    assert int(res2.status) == int(ref.status)
    assert int(res2.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(res2.x), np.asarray(ref.x))


def test_patience_fires_on_quantized_floor():
    """A coarsely quantized objective stops resolving decreases long before
    the true optimum: the patience exit must terminate the run within
    ~patience iterations of the floor instead of grinding the budget."""
    from gpz_tpu.optim.lbfgs import STATUS_PLATEAU, STATUS_STEP_TOO_SMALL

    q = 0.05

    def quantized(x):
        f = rosenbrock(x)
        return jax.lax.stop_gradient(jnp.round(f / q) * q - f) + f

    res = minimize(wrap(quantized), jnp.asarray([-1.2, 1.0]), max_iter=500,
                   patience=10, patience_tol=1e-6)
    assert int(res.status) in (STATUS_PLATEAU, STATUS_STEP_TOO_SMALL)
    assert int(res.iterations) < 490
