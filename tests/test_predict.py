"""Prediction-stack tests.

1. Collapse exactness: the unified moment-matching path with psi == 0 and no
   missing dims must equal the clean fast path (the 4-regimes-in-1 design).
2. Monte-Carlo validation of the noisy moment matching: gamma/nu/beta_i are
   defined as moments of phi(x) under x ~ N(x0, Psi) — estimated directly.
3. Loopy port-of-record of the missing/noisy-missing diag math
   (ref predictDiag.m:127-296) vs the vectorized implementation.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from gpz_tpu.config import ModelConfig
from gpz_tpu.objective import Posterior
from gpz_tpu.params import GPzParams
from gpz_tpu.predict import (
    predict_clean,
    predict_moments_diag,
    predict_moments_full,
)

from test_phi import make_params


def make_post(rng, m, k):
    A = rng.standard_normal((k, m, m)) * 0.05
    iSw = A @ np.swapaxes(A, 1, 2) + 0.1 * np.eye(m)
    return Posterior(
        w=jnp.asarray(rng.standard_normal((m, k))),
        iSigma_w=jnp.asarray(iSw),
        logdet=jnp.zeros(k),
    )


@pytest.mark.parametrize("method", ["VD", "VC"])
def test_unified_collapses_to_clean(rng, method):
    n, d, m, k = 13, 3, 5, 1
    cfg = ModelConfig(m=m, d=d, k=k, method=method, dtype="float64")
    params = make_params(rng, cfg)
    post = make_post(rng, m, k)
    priors = jnp.full((m,), 1.0 / m)
    X = jnp.asarray(rng.standard_normal((n, d)))
    mask = jnp.ones((n, d), bool)
    psi0 = jnp.zeros((n, d, d) if cfg.full_cov else (n, d))

    clean = predict_clean(params, post, cfg, X, mask, None, complete=True)
    fn = predict_moments_full if cfg.full_cov else predict_moments_diag
    unified = fn(params, post, priors, cfg, X, jnp.ones(d), psi0, True)

    for a, b, name in zip(clean, unified, ["mu", "nu", "beta_i", "gamma", "phi"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8, err_msg=name
        )


@pytest.mark.parametrize("method", ["VD", "VC"])
def test_noisy_moments_match_monte_carlo(rng, method):
    """gamma = Var[phi^T w], nu = E[phi^T iSigma_w phi],
    beta_i ~ exp(E lnS)(1 + Var lnS / 2) under x ~ N(x0, Psi)."""
    n, d, m, k = 4, 2, 4, 1
    cfg = ModelConfig(m=m, d=d, k=k, method=method, dtype="float64")
    params = make_params(rng, cfg)
    post = make_post(rng, m, k)
    priors = jnp.full((m,), 1.0 / m)
    X = rng.standard_normal((n, d)) * 0.5
    psi_d = 0.05 + 0.05 * rng.random((n, d))

    if cfg.full_cov:
        psi = np.zeros((n, d, d))
        psi[:, np.arange(d), np.arange(d)] = psi_d
    else:
        psi = psi_d

    fn = predict_moments_full if cfg.full_cov else predict_moments_diag
    mu, nu, beta_i, gamma, phi = fn(
        params, post, priors, cfg, jnp.asarray(X), jnp.ones(d),
        jnp.asarray(psi), True,
    )

    # Monte-Carlo: sample x, evaluate exact phi, take moments
    S = 400_000
    P = np.asarray(params.P)
    w = np.asarray(post.w)
    v = np.asarray(params.v)
    iSw = np.asarray(post.iSigma_w)[0]
    G = np.asarray(params.expand_gamma(cfg))

    for i in range(n):
        xs = X[i][None, :] + rng.standard_normal((S, d)) * np.sqrt(psi_d[i])[None, :]
        if cfg.full_cov:
            q = np.zeros((S, m))
            for j in range(m):
                iSig = G[j].T @ G[j]
                dd = xs - P[j]
                q[:, j] = np.einsum("sd,de,se->s", dd, iSig, dd)
        else:
            q = (((xs[:, None, :] - P[None, :, :]) ** 2) * (G**2)[None]).sum(-1)
        phis = np.exp(-0.5 * q)                     # (S, m)
        f = phis @ w[:, 0]
        lnS = phis @ v[:, 0]
        mc_mu = f.mean()
        mc_gamma = f.var()
        mc_nu = np.einsum("sm,mj,sj->s", phis, iSw, phis).mean()
        mc_ElnS = lnS.mean()
        mc_VlnS = lnS.var()

        np.testing.assert_allclose(float(mu[i, 0]), mc_mu, rtol=0.03, atol=5e-3)
        np.testing.assert_allclose(float(gamma[i, 0]), mc_gamma, rtol=0.08, atol=5e-3)
        np.testing.assert_allclose(float(nu[i, 0]), mc_nu, rtol=0.05, atol=5e-3)
        expect_beta = math.exp(mc_ElnS + float(params.b[0])) * (1 + 0.5 * mc_VlnS)
        np.testing.assert_allclose(float(beta_i[i, 0]), expect_beta, rtol=0.05, atol=5e-3)


def _ref_predict_missing_diag(X, psi, P, Sigma, w, v, b, iSw, priors):
    """Loopy port-of-record of predictDiag.m:211-296 (psi==0 gives 127-209)."""
    n, d = X.shape
    m, k = w.shape
    o = ~np.isnan(X[0])
    u = ~o
    iS = 1.0 / Sigma
    lnz = 0.5 * np.sum(np.log(Sigma), axis=1)

    No = np.zeros((n, m))
    for i in range(m):
        sp = psi[:, o] + Sigma[i, o][None, :]
        delta = X[:, o] - P[i, o][None, :]
        No[:, i] = np.exp(
            -0.5 * np.sum(delta**2 / sp, 1) - 0.5 * np.sum(np.log(sp), 1)
        )
    Ex = No * priors[None, :]
    Pio = Ex / Ex.sum(1, keepdims=True)

    Nij = np.zeros((m, m))
    for i in range(m):
        for j in range(m):
            ss = Sigma[i, u] + Sigma[j, u]
            Nij[i, j] = np.exp(
                -0.5 * np.sum((P[i, u] - P[j, u]) ** 2 / ss)
                - 0.5 * np.sum(np.log(ss))
            )
    PHI = np.exp(lnz)[None, :] * No * (Pio @ Nij)
    mu = PHI @ w
    ElnS = PHI @ v

    gamma = np.zeros((n, k))
    VlnS = np.zeros((n, k))
    nu = np.zeros((n, k))
    for i in range(m):
        for j in range(m):
            Cij = 1.0 / (iS[i] + iS[j])
            cij = (P[i] * iS[i] + P[j] * iS[j]) * Cij
            cp = psi[:, o] + Cij[o][None, :]
            lnNo_p = -0.5 * np.sum((X[:, o] - cij[o]) ** 2 / cp, 1) - 0.5 * np.sum(
                np.log(cp), 1
            )
            Nu = np.zeros(m)
            for l in range(m):
                sc = Sigma[l, u] + Cij[u]
                Nu[l] = np.exp(
                    -0.5 * np.sum((P[l, u] - cij[u]) ** 2 / sc)
                    - 0.5 * np.sum(np.log(sc))
                )
            Ec = np.exp(lnNo_p) * (Pio @ Nu)
            ss = Sigma[i] + Sigma[j]
            Zij = (
                np.exp(
                    lnz[i] + lnz[j]
                    - 0.5 * np.sum((P[i] - P[j]) ** 2 / ss)
                    - 0.5 * np.sum(np.log(ss))
                )
                * Ec
            )
            gamma += Zij[:, None] * (w[i] * w[j])[None, :]
            VlnS += Zij[:, None] * (v[i] * v[j])[None, :]
            nu += Zij[:, None] * iSw[:, i, j][None, :]
    VlnS -= ElnS**2
    beta_i = np.exp(ElnS + b[None, :]) * (1 + 0.5 * VlnS)
    gamma -= mu**2
    return mu, nu, beta_i, gamma, PHI


@pytest.mark.parametrize("with_psi", [False, True])
def test_missing_diag_vs_loopy_reference(rng, with_psi):
    n, d, m, k = 9, 3, 4, 1
    cfg = ModelConfig(m=m, d=d, k=k, method="VD", dtype="float64")
    params = make_params(rng, cfg)
    post = make_post(rng, m, k)
    priors = np.asarray(rng.random(m)) + 0.1
    priors /= priors.sum()

    X = rng.standard_normal((n, d))
    X[:, 2] = np.nan  # one shared missing dim
    psi = (0.05 + 0.1 * rng.random((n, d))) if with_psi else np.zeros((n, d))

    Sigma = np.asarray(params.expand_gamma(cfg)) ** -2.0
    exp = _ref_predict_missing_diag(
        X, psi, np.asarray(params.P), Sigma, np.asarray(post.w),
        np.asarray(params.v), np.asarray(params.b),
        np.asarray(post.iSigma_w), priors,
    )

    mask_vec = jnp.asarray([1.0, 1.0, 0.0])
    Xz = np.where(np.isnan(X), 0.0, X)
    got = predict_moments_diag(
        params, post, jnp.asarray(priors), cfg, jnp.asarray(Xz), mask_vec,
        jnp.asarray(psi), False,
    )
    for g, e, name in zip(got, exp, ["mu", "nu", "beta_i", "gamma", "phi"]):
        np.testing.assert_allclose(
            np.asarray(g), e, rtol=1e-7, atol=1e-10, err_msg=name
        )


@pytest.mark.parametrize("method", ["VD", "VC"])
@pytest.mark.parametrize("complete", [True, False])
def test_blocked_pair_pass_matches_single_block(rng, method, complete,
                                                monkeypatch):
    """The i-blocked pair pass (predict.PAIR_BUDGET tiling) must reproduce
    the one-shot result bit-tolerantly, including partial trailing blocks
    (m=7 with B=2 -> pad) and the l-chunked mixture sums of the missing
    paths (VERDICT r1 item 7)."""
    import importlib

    predict_mod = importlib.import_module("gpz_tpu.predict")

    n, d, m, k = 9, 3, 7, 2
    cfg = ModelConfig(m=m, d=d, k=k, method=method, dtype="float64")
    params = make_params(rng, cfg)
    post = make_post(rng, m, k)
    priors = jnp.asarray(rng.dirichlet(np.ones(m)))
    X = jnp.asarray(rng.standard_normal((n, d)))
    mask_vec = jnp.ones(d, bool) if complete else jnp.asarray([True, False, True])
    if cfg.full_cov:
        A = rng.standard_normal((n, d, d)) * 0.1
        psi = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 0.05 * np.eye(d))
    else:
        psi = jnp.asarray(0.05 + 0.1 * rng.random((n, d)))
    Xz = X * mask_vec[None, :].astype(X.dtype)

    fn = predict_moments_full if cfg.full_cov else predict_moments_diag
    one_shot = fn(params, post, priors, cfg, Xz, mask_vec.astype(X.dtype),
                  psi, complete)

    # force B=2 -> 4 blocks with a padded tail
    monkeypatch.setattr(predict_mod, "PAIR_BUDGET", n * m * d * d * 2 // 1)
    monkeypatch.setattr(predict_mod, "_block_size",
                        lambda n_, m_, dc, budget=0, itemsize=4: 2)
    blocked = fn(params, post, priors, cfg, Xz, mask_vec.astype(X.dtype),
                 psi, complete)

    for a, b, name in zip(one_shot, blocked,
                          ["mu", "nu", "beta_i", "gamma", "phi"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-12, err_msg=name
        )


def test_mixture_truncation_topl(rng, monkeypatch):
    """Full-covariance missing-data mixture truncation (predict.MIX_TOPL):
    L >= m must be bit-identical to the full sum; a peaked-responsibility
    problem must agree closely at small L (VERDICT r3 item 6)."""
    import importlib

    predict_mod = importlib.import_module("gpz_tpu.predict")

    n, d, m, k = 12, 3, 24, 1
    cfg = ModelConfig(m=m, d=d, k=k, method="VC", dtype="float64")
    params = make_params(rng, cfg)
    post = make_post(rng, m, k)
    # trained models concentrate the EM prior on a few bases (ref
    # getPrior.m fixed point collapses most to ~0) — that concentration is
    # the truncation's premise, so the test constructs it explicitly
    pr = np.full(m, 1e-9)
    pr[:5] = rng.dirichlet(np.ones(5)) * (1 - (m - 5) * 1e-9)
    priors = jnp.asarray(pr)
    X = jnp.asarray(rng.standard_normal((n, d)))
    mask_vec = jnp.asarray([True, False, True])
    A = rng.standard_normal((n, d, d)) * 0.1
    psi = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 0.05 * np.eye(d))
    Xz = X * mask_vec[None, :].astype(X.dtype)

    def run():
        return predict_moments_full(params, post, priors, cfg, Xz,
                                    mask_vec.astype(X.dtype), psi, False)

    monkeypatch.setattr(predict_mod, "MIX_TOPL", m)       # exact
    full = run()
    monkeypatch.setattr(predict_mod, "MIX_TOPL", 10 * m)  # also exact
    over = run()
    for a, b in zip(full, over):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    monkeypatch.setattr(predict_mod, "MIX_TOPL", 8)       # truncated
    trunc = run()
    for a, b, name in zip(full, trunc, ["mu", "nu", "beta_i", "gamma",
                                        "phi"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=1e-6, err_msg=name)


def test_bucket_padding_bounds_compiles_and_preserves_outputs():
    """VERDICT r4 next #4: a catalog with >= 16 ragged missingness patterns
    must compile O(log batch) moment-kernel shapes (power-of-two bucket
    padding), not one per (pattern, group-size) — and padding must not
    change any output row."""
    import gpz_tpu
    from gpz_tpu.model import _predict_functions

    rng = np.random.default_rng(7)
    n, d = 500, 5
    X = rng.standard_normal((n, d))
    y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(n)
    model = gpz_tpu.init(X, y, "VD", 8, seed=0)

    # >= 16 DISTINCT patterns (enumerated proper subsets of the d features)
    # with ragged group sizes (1..40 rows each)
    import itertools

    pats = [
        list(c)
        for r in (1, 2, 3)
        for c in itertools.combinations(range(d), r)
    ][:20]
    Xq = rng.standard_normal((400, d))
    row = 0
    sizes = rng.integers(1, 40, size=len(pats))
    for miss, sz in zip(pats, sizes):
        stop = min(row + int(sz), len(Xq))
        Xq[row:stop, miss] = np.nan
        row = stop
    n_patterns = np.unique(~np.isnan(Xq), axis=0).shape[0]
    assert n_patterns >= 16

    _, moments_fn = _predict_functions(model.cfg)
    before = moments_fn._cache_size()
    pred = gpz_tpu.predict(Xq, model)
    added = moments_fn._cache_size() - before
    # power-of-two buckets in [16, 2048]: at most ~8 shapes regardless of
    # pattern count; in practice group sizes <= 60 -> buckets {16, 32, 64}
    assert added <= 6, added
    assert np.isfinite(pred.mu).all() and np.isfinite(pred.sigma).all()

    # padding must be invisible: predicting any slice alone gives the same
    # rows (different bucket sizes, same values)
    sl = slice(0, 37)
    pred_sl = gpz_tpu.predict(Xq[sl], model)
    np.testing.assert_allclose(pred.mu[sl], pred_sl.mu, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(
        pred.sigma[sl], pred_sl.sigma, rtol=1e-6, atol=1e-9
    )


def test_mix_truncation_guard_escalates_on_flat_responsibilities():
    """ADVICE r4 #1: blind top-L truncation of the conditioning mixture is
    unbounded when responsibilities are flat. The guard must detect low
    top-L mass and escalate to the exact full sum."""
    import importlib

    import gpz_tpu

    # gpz_tpu.predict the ATTRIBUTE is the model-level function (it shadows
    # the submodule); fetch the module itself for its truncation knobs
    predict_mod = importlib.import_module("gpz_tpu.predict")

    rng = np.random.default_rng(3)
    n, d = 60, 3
    m = 80  # > MIX_TOPL after the monkeypatch below
    X = rng.standard_normal((n, d))
    y = np.sin(X[:, 0])
    model = gpz_tpu.init(X, y, "VC", m, seed=0)
    # untrained model with uniform priors -> responsibilities far from
    # peaked; force a tiny truncation width so the guard must fire
    Xq = rng.standard_normal((40, d))
    Xq[:, 2] = np.nan

    old = predict_mod.MIX_TOPL
    predict_mod.MIX_TOPL = 4
    try:
        pred_guarded = gpz_tpu.predict(Xq, model)
        # exact reference: truncation disabled entirely
        predict_mod.MIX_TOPL = m
        pred_exact = gpz_tpu.predict(Xq, model)
    finally:
        predict_mod.MIX_TOPL = old

    np.testing.assert_allclose(
        pred_guarded.sigma, pred_exact.sigma, rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        pred_guarded.mu, pred_exact.mu, rtol=1e-6, atol=1e-9
    )
