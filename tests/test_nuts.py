"""NUTS correctness: exact Gaussian moments, convergence diagnostics, and
agreement with the HMC sampler on the same target."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpz_tpu.inference.nuts import nuts_sample
from gpz_tpu.inference.mcmc import split_rhat


def test_nuts_recovers_correlated_gaussian(rng):
    A = np.array([[2.0, 0.5, 0.0], [0.5, 1.0, 0.3], [0.0, 0.3, 0.5]])
    prec = np.linalg.inv(A)
    mu = np.array([1.0, -2.0, 0.5])
    precj, muj = jnp.asarray(prec), jnp.asarray(mu)

    def logp(x):
        d = x - muj
        return -0.5 * d @ precj @ d

    samples, info = nuts_sample(
        logp, jnp.zeros(3), jax.random.PRNGKey(0),
        num_warmup=400, num_samples=600, num_chains=4, max_depth=8,
    )
    flat = np.asarray(samples).reshape(-1, 3)
    assert float(info["accept_rate"].mean()) > 0.6
    assert int(info["divergences"].sum()) == 0
    np.testing.assert_allclose(flat.mean(0), mu, atol=0.12)
    np.testing.assert_allclose(np.cov(flat.T), A, atol=0.35)
    rhat = np.asarray(split_rhat(samples))
    assert np.all(rhat < 1.1), rhat
    # trees actually grow (not degenerate single-step trajectories)
    assert float(info["mean_tree_depth"].mean()) > 1.5


def test_nuts_anisotropic_scales(rng):
    """Badly scaled diagonal Gaussian: mass adaptation must cope."""
    sd = jnp.asarray([0.05, 1.0, 20.0])

    def logp(x):
        return -0.5 * jnp.sum((x / sd) ** 2)

    samples, info = nuts_sample(
        logp, jnp.zeros(3), jax.random.PRNGKey(1),
        num_warmup=500, num_samples=500, num_chains=2, max_depth=9,
    )
    flat = np.asarray(samples).reshape(-1, 3)
    got_sd = flat.std(0)
    np.testing.assert_allclose(got_sd, np.asarray(sd), rtol=0.3)


def test_nuts_banana_analytic_moments(rng):
    """Curved 2-d target with known moments: x0 ~ N(0, 4),
    x1 | x0 ~ N(0.3 x0^2, 1) => E[x1] = 1.2, sd = [2.0, ~1.97]."""

    def logp(x):
        return -0.5 * (x[0] ** 2 / 4.0 + (x[1] - 0.3 * x[0] ** 2) ** 2)

    s_nuts, info = nuts_sample(
        logp, jnp.zeros(2), jax.random.PRNGKey(5),
        num_warmup=800, num_samples=1500, num_chains=3, max_depth=10,
    )
    a = np.asarray(s_nuts).reshape(-1, 2)
    np.testing.assert_allclose(a.mean(0), [0.0, 1.2], atol=0.25)
    np.testing.assert_allclose(a.std(0), [2.0, 1.97], rtol=0.2)
    assert float(info["accept_rate"].mean()) > 0.5
