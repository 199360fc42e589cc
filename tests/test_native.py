"""Native C++ kernel tests (parity layer for ref minFunc/mex/*.c)."""

import os
import tempfile

import numpy as np
import pytest

from gpz_tpu import native
from gpz_tpu.optim.host_lbfgs import minimize_host


def test_native_builds():
    assert native.available(), "g++ build of libgpz_native.so failed"


def test_lbfgs_direction_matches_dense_inverse(rng):
    """With full history on a quadratic, two-loop recursion == BFGS matrix."""
    p, hist = 6, 10
    S = np.zeros((hist, p))
    Y = np.zeros((hist, p))
    count, pos, hdiag = 0, 0, 1.0
    A = rng.standard_normal((p, p))
    Q = A @ A.T + np.eye(p)
    for _ in range(4):
        s = rng.standard_normal(p)
        y = Q @ s  # exact quadratic curvature
        count, pos, hdiag, ok = native.lbfgs_add(S, Y, count, pos, hdiag, s, y)
        assert ok
    g = rng.standard_normal(p)
    d = native.lbfgs_direction(S, Y, count, pos, hdiag, g)
    # compare against the reference dense recursive BFGS update
    H = hdiag * np.eye(p)
    idxs = [(pos - count + i) % hist for i in range(count)]
    for j in idxs:
        s, y = S[j], Y[j]
        rho = 1.0 / (y @ s)
        V = np.eye(p) - rho * np.outer(y, s)
        H = V.T @ H @ V + rho * np.outer(s, s)
    np.testing.assert_allclose(d, -H @ g, rtol=1e-10)


def test_lbfgs_add_skip_rule(rng):
    p, hist = 4, 3
    S = np.zeros((hist, p))
    Y = np.zeros((hist, p))
    s = rng.standard_normal(p)
    # negative curvature pair must be skipped (ref lbfgsAdd.m:5)
    count, pos, hdiag, ok = native.lbfgs_add(S, Y, 0, 0, 1.0, s, -s)
    assert not ok and count == 0 and pos == 0


def test_lbfgs_circular_wraparound(rng):
    p, hist = 3, 2
    S = np.zeros((hist, p))
    Y = np.zeros((hist, p))
    count, pos, hdiag = 0, 0, 1.0
    for i in range(5):
        s = rng.standard_normal(p)
        y = s * (1.0 + rng.random())
        count, pos, hdiag, ok = native.lbfgs_add(S, Y, count, pos, hdiag, s, y)
    assert count == hist
    assert 0 <= pos < hist


def test_mchol_psd_recovers_plain_cholesky(rng):
    A = rng.standard_normal((5, 5))
    Q = A @ A.T + 5 * np.eye(5)
    L, d, perm = native.modified_cholesky(Q)
    rec = L @ np.diag(d) @ L.T
    np.testing.assert_allclose(rec, Q[np.ix_(perm, perm)], rtol=1e-8, atol=1e-8)


def test_mchol_indefinite_gives_pd(rng):
    A = rng.standard_normal((6, 6))
    Q = (A + A.T) / 2  # indefinite
    L, d, perm = native.modified_cholesky(Q)
    assert np.all(d > 0)
    rec = L @ np.diag(d) @ L.T
    # rec = Q[perm][:,perm] + E with E diagonal-dominant correction
    diff = rec - Q[np.ix_(perm, perm)]
    off = diff - np.diag(np.diag(diff))
    np.testing.assert_allclose(off, 0, atol=1e-7)


def test_csv_reader_roundtrip(rng):
    data = rng.standard_normal((100, 7))
    data[3, 2] = np.nan
    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as fh:
        path = fh.name
        for row in data:
            fh.write(",".join("" if np.isnan(v) else f"{v:.12g}" for v in row))
            fh.write("\n")
    try:
        out = native.read_csv(path)
        assert out.shape == (100, 7)
        np.testing.assert_allclose(
            out[~np.isnan(data)], data[~np.isnan(data)], rtol=1e-10
        )
        assert np.isnan(out[3, 2])
    finally:
        os.unlink(path)


def test_csv_reader_no_trailing_newline(rng):
    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as fh:
        path = fh.name
        fh.write("1.5,2.5\n3.5,4.5")  # no trailing newline
    try:
        out = native.read_csv(path)
        np.testing.assert_allclose(out, [[1.5, 2.5], [3.5, 4.5]])
    finally:
        os.unlink(path)


def test_host_lbfgs_rosenbrock():
    def rosen(x):
        f = np.sum(100 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)
        g = np.zeros_like(x)
        g[:-1] = -400 * x[:-1] * (x[1:] - x[:-1] ** 2) - 2 * (1 - x[:-1])
        g[1:] += 200 * (x[1:] - x[:-1] ** 2)
        return f, g

    res = minimize_host(rosen, np.zeros(8), max_iter=500)
    np.testing.assert_allclose(res.x, np.ones(8), atol=1e-4)
    assert res.status in ("optimal", "prog_tol", "no_descent")


def test_host_lbfgs_matches_device_lbfgs(rng):
    """Same quadratic, same converged optimum as the jitted optimizer."""
    import jax.numpy as jnp
    import jax
    from gpz_tpu.optim import minimize

    p = 10
    A = rng.standard_normal((p, p))
    Q = A @ A.T + np.eye(p)
    b = rng.standard_normal(p)

    def f_np(x):
        return 0.5 * x @ Q @ x - b @ x, Q @ x - b

    res_h = minimize_host(f_np, np.zeros(p), max_iter=200)

    Qj, bj = jnp.asarray(Q), jnp.asarray(b)
    vg = jax.value_and_grad(lambda x: 0.5 * x @ Qj @ x - bj @ x)

    def f_j(x):
        v, g = vg(x)
        return v, g, ()

    res_d = minimize(f_j, jnp.zeros(p), max_iter=200)
    np.testing.assert_allclose(res_h.x, np.asarray(res_d.x), atol=1e-5)
