"""Float64 NumPy port-of-record of the reference math, for parity testing.

Independent re-implementation of the equations in ref GPz/getPHI.m and
GPz/GPz.m (written from the math, with the reference's per-missingness-group
looping structure), used as the ground truth the vectorized masked JAX
implementation must match. This is the BASELINE.md protocol step 1.

Deliberately slow and loopy — clarity over speed.
"""

from __future__ import annotations

import math

import numpy as np

LN2 = math.log(2.0)
LN2PI = math.log(2.0 * math.pi)


def expand_gamma(gamma, method, m, d):
    """Canonical gamma -> (m, d) or (m, d, d) working form."""
    g = np.asarray(gamma, dtype=np.float64)
    if method in ("GC", "VC"):
        return np.broadcast_to(g, (m, d, d))
    return np.broadcast_to(g, (m, d))


def ref_log_phi(X, psi, P, gamma, method):
    """(lnPHI, lnN) with NaN-missing handling, per ref getPHI.m:43-110.

    X may contain NaNs. psi: None | (n, d) | (n, d, d).
    """
    n, d = X.shape
    m = P.shape[0]
    G = expand_gamma(gamma, method, m, d)
    ln_phi = np.zeros((n, m))
    ln_n = np.zeros((n, m))
    full = method in ("GC", "VC")

    for i in range(n):
        o = ~np.isnan(X[i])
        u = ~o
        nu_ = u.sum()
        no_ = o.sum()
        for j in range(m):
            delta = X[i, o] - P[j, o]
            if full:
                iSig = G[j].T @ G[j]
                Sigma = np.linalg.inv(iSig)
                Soo = Sigma[np.ix_(o, o)]
                _, ld_Soo = np.linalg.slogdet(Soo)
                if psi is None:
                    q = delta @ np.linalg.solve(Soo, delta)
                    lp = -0.5 * q - 0.5 * nu_ * LN2
                else:
                    ps = psi[i][np.ix_(o, o)] + Soo
                    _, ld_ps = np.linalg.slogdet(ps)
                    q = delta @ np.linalg.solve(ps, delta)
                    lp = -0.5 * q + 0.5 * ld_Soo - 0.5 * ld_ps - 0.5 * nu_ * LN2
                ln_phi[i, j] = lp
                ln_n[i, j] = lp - 0.5 * ld_Soo - 0.5 * no_ * LN2PI + 0.5 * nu_ * LN2
            else:
                Sigma = G[j, o] ** -2.0
                if psi is None:
                    q = np.sum(delta**2 / Sigma)
                    lp = -0.5 * q - 0.5 * nu_ * LN2
                else:
                    ps = psi[i, o] + Sigma
                    q = np.sum(delta**2 / ps)
                    logr = np.sum(np.log1p(psi[i, o] / Sigma))
                    lp = -0.5 * q - 0.5 * logr - 0.5 * nu_ * LN2
                ln_phi[i, j] = lp
                ln_n[i, j] = (
                    lp
                    - 0.5 * np.sum(np.log(Sigma))
                    - 0.5 * no_ * LN2PI
                    + 0.5 * nu_ * LN2
                )
    return ln_phi, ln_n


def ref_nlog_ml(X, Y, psi, omega, P, gamma, ln_alpha, b, v, ln_tau, method):
    """Scalar negative mean log-ML, per ref GPz.m:43-110,233.

    Y: (n, k); omega: (n,). v/ln_tau None => homoscedastic.
    """
    n, d = X.shape
    m, k = ln_alpha.shape
    ln_phi, _ = ref_log_phi(X, psi, P, gamma, method)
    PHI = np.exp(ln_phi)
    ln_beta = np.broadcast_to(b[None, :], (n, k)).copy()
    if v is not None:
        ln_beta = ln_beta + PHI @ v
    beta = np.exp(-ln_beta)
    alpha = np.exp(ln_alpha)

    total = 0.0
    w_all = np.zeros((m, k))
    for kk in range(k):
        ob = omega * beta[:, kk]
        SIGMA = PHI.T @ (ob[:, None] * PHI) + np.diag(alpha[:, kk])
        sign, logdet = np.linalg.slogdet(SIGMA)
        w = np.linalg.solve(SIGMA, PHI.T @ (ob * Y[:, kk]))
        w_all[:, kk] = w
        delta = PHI @ w - Y[:, kk]
        total += (
            -0.5 * np.sum(ob * delta**2)
            - 0.5 * np.sum(alpha[:, kk] * w**2)
            + 0.5 * np.sum(ln_alpha[:, kk])
            - 0.5 * logdet
            - 0.5 * np.sum(ln_beta[:, kk] * omega)
        )
        if v is not None:
            tau = np.exp(ln_tau[:, kk])
            total += (
                -0.5 * np.sum(v[:, kk] ** 2 * tau)
                + 0.5 * np.sum(ln_tau[:, kk])
                - 0.5 * m * LN2PI
            )
    total -= 0.5 * LN2PI * k * np.sum(omega)
    return -total / (n * k), w_all
