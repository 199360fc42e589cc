"""Posterior-inference tests: HMC and ADVI on known Gaussians, then on the
GPz marginal likelihood itself (posterior mass should concentrate near the
MAP found by L-BFGS)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpz_tpu.inference import hmc_sample, advi_fit, gpz_log_posterior
from gpz_tpu.inference.mcmc import split_rhat
from gpz_tpu.inference.vi import sample_q


def test_hmc_recovers_gaussian(rng):
    """Correlated 3-d Gaussian: sample mean/cov within MC error."""
    A = np.array([[2.0, 0.5, 0.0], [0.5, 1.0, 0.3], [0.0, 0.3, 0.5]])
    prec = np.linalg.inv(A)
    mu = np.array([1.0, -2.0, 0.5])
    precj, muj = jnp.asarray(prec), jnp.asarray(mu)

    def logp(x):
        d = x - muj
        return -0.5 * d @ precj @ d

    samples, info = hmc_sample(
        logp, jnp.zeros(3), jax.random.PRNGKey(0),
        num_warmup=400, num_samples=600, num_chains=4, num_leapfrog=16,
    )
    flat = np.asarray(samples).reshape(-1, 3)
    assert float(info["accept_rate"].mean()) > 0.6
    np.testing.assert_allclose(flat.mean(0), mu, atol=0.15)
    np.testing.assert_allclose(np.cov(flat.T), A, atol=0.4)
    rhat = np.asarray(split_rhat(samples))
    assert np.all(rhat < 1.15), rhat


def test_advi_recovers_diagonal_gaussian():
    mu = jnp.asarray([2.0, -1.0])
    sd = jnp.asarray([0.5, 1.5])

    def logp(x):
        return -0.5 * jnp.sum((x - mu) ** 2 / sd**2)

    m, rho, elbos = advi_fit(
        logp, jnp.zeros(2), jax.random.PRNGKey(1), num_steps=2000, lr=5e-2
    )
    np.testing.assert_allclose(np.asarray(m), np.asarray(mu), atol=0.1)
    np.testing.assert_allclose(np.exp(np.asarray(rho)), np.asarray(sd), rtol=0.25)
    assert float(elbos[-100:].mean()) > float(elbos[:100].mean())


def test_hmc_on_gpz_posterior(rng):
    """Posterior over GPz hyperparameters concentrates near the L-BFGS MAP.

    Uses structured data + homoscedastic model + a weak hyperprior: with
    pure-noise targets the heteroscedastic marginal likelihood has improper
    ridges (ln_tau as v -> 0) that the MAP itself runs off to.
    """
    from gpz_tpu.config import ModelConfig
    from gpz_tpu.dataset import Dataset
    from gpz_tpu.objective import nlog_ml
    from gpz_tpu.optim import minimize
    from jax.flatten_util import ravel_pytree
    from test_phi import make_params

    n, d, m = 120, 2, 3
    cfg = ModelConfig(m=m, d=d, k=1, method="VL", heteroscedastic=False,
                      dtype="float64")
    params = make_params(rng, cfg)
    params = params.__class__(
        P=params.P, gamma=params.gamma, ln_alpha=params.ln_alpha,
        b=params.b, v=None, ln_tau=None,
    )
    X = rng.standard_normal((n, d))
    Y = (np.sin(X[:, 0]) + 0.5 * X[:, 1] + 0.2 * rng.standard_normal(n))[:, None]
    data = Dataset(
        X=jnp.asarray(X), mask=jnp.ones((n, d), bool),
        omega=jnp.ones(n), Y=jnp.asarray(Y),
    )
    flat0, unravel = ravel_pytree(params)

    def nlml_flat(x):
        return nlog_ml(unravel(x), data, cfg, complete=True)[0]

    vg = jax.value_and_grad(nlml_flat)
    res = minimize(lambda x: (*vg(x), ()), flat0, max_iter=150)
    map_nlml = float(res.f)

    logp = gpz_log_posterior(
        nlml_flat, n_eff=float(n), k=1, prior_mean=res.x, prior_scale=2.0
    )
    samples, info = hmc_sample(
        logp, res.x, jax.random.PRNGKey(2),
        num_warmup=200, num_samples=200, num_chains=2, num_leapfrog=8,
        init_jitter=0.001,
    )
    flat = samples.reshape(-1, samples.shape[-1])
    nlmls = np.asarray(jax.vmap(nlml_flat)(flat[::10]))
    # posterior draws stay within a few nats/sample of the MAP
    assert np.isfinite(nlmls).all()
    assert np.median(nlmls) < map_nlml + 0.5
    assert float(info["accept_rate"].mean()) > 0.4


def test_vi_sampler_shapes():
    mu = jnp.zeros(4)
    rho = jnp.full(4, -1.0)
    s = sample_q(mu, rho, jax.random.PRNGKey(0), 32)
    assert s.shape == (32, 4)


def test_sample_posterior_api(rng):
    """End-to-end: train a small model, sample hyperparameter posterior,
    produce posterior-predictive draws."""
    import gpz_tpu
    from gpz_tpu.inference import sample_posterior, predictive_draws

    n = 200
    X = rng.standard_normal((n, 1))
    Y = np.sin(2 * X[:, 0]) + 0.1 * rng.standard_normal(n)
    tr = np.ones(n, bool)
    model = gpz_tpu.init(X, Y, "VL", 5, heteroscedastic=False, training=tr,
                         seed=0, dtype="float64")
    model = gpz_tpu.train(model, X, Y, training=tr, max_iter=40,
                          verbose=False)
    samples, info = sample_posterior(
        model, X, Y, training=tr, num_warmup=80, num_samples=80,
        num_chains=2, seed=0,
    )
    assert samples.shape[0] == 2 and samples.shape[1] == 80
    assert float(info["accept_rate"].mean()) > 0.4

    Xs = np.linspace(-2, 2, 20)[:, None]
    mus, mean_mu, std_mu = predictive_draws(model, samples, info, Xs, thin=20)
    assert mean_mu.shape == (20, 1)
    assert np.all(np.isfinite(mean_mu)) and np.all(std_mu >= 0)
    # posterior-predictive mean should track the MAP prediction
    map_mu = gpz_tpu.predict(Xs, model).mu
    assert np.max(np.abs(mean_mu - map_mu)) < 1.0
