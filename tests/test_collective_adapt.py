"""Collective step-size / mass-matrix adaptation across chains.

BASELINE.json north star: "restart/chain parallelism ... collective step-size
adaptation via psum of acceptance stats". The reference has no sampling at
all; the closest anchor is its multi-restart training loop (init.m:58).
These tests cover both the single-device pooled path and the cross-device
pmean path (chains sharded over the mesh `restart` axis under shard_map) on
the 8-virtual-device CPU mesh from conftest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from gpz_tpu.inference import hmc_sample, nuts_sample
from gpz_tpu.inference.mcmc import split_rhat
from gpz_tpu.parallel.mesh import make_mesh, RESTART_AXIS


def _corr_gauss():
    A = np.array([[2.0, 0.5, 0.0], [0.5, 1.0, 0.3], [0.0, 0.3, 0.5]])
    prec = jnp.asarray(np.linalg.inv(A))
    mu = jnp.asarray([1.0, -2.0, 0.5])

    def logp(x):
        d = x - mu
        return -0.5 * d @ prec @ d

    return logp, np.asarray(mu), A


def test_hmc_collective_recovers_gaussian():
    logp, mu, A = _corr_gauss()
    samples, info = hmc_sample(
        logp, jnp.zeros(3), jax.random.PRNGKey(0),
        num_warmup=400, num_samples=600, num_chains=4, num_leapfrog=16,
        collective_adapt=True,
    )
    # one SHARED step size for all chains
    assert np.asarray(info["step_size"]).shape == ()
    assert float(info["step_size"]) > 0
    assert float(np.mean(np.asarray(info["accept_rate"]))) > 0.6
    flat = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(flat.mean(0), mu, atol=0.15)
    np.testing.assert_allclose(np.cov(flat.T), A, atol=0.4)
    assert np.all(np.asarray(split_rhat(samples)) < 1.15)


def test_nuts_collective_anisotropic():
    sd = jnp.asarray([0.05, 1.0, 20.0])

    def logp(x):
        return -0.5 * jnp.sum((x / sd) ** 2)

    samples, info = nuts_sample(
        logp, jnp.zeros(3), jax.random.PRNGKey(1),
        num_warmup=500, num_samples=500, num_chains=4,
        collective_adapt=True,
    )
    assert np.asarray(info["step_size"]).shape == ()
    flat = np.asarray(samples).reshape(-1, 3)
    # the shared mass matrix must resolve the 400x scale spread
    np.testing.assert_allclose(
        flat.std(0), np.asarray(sd), rtol=0.35
    )
    assert float(np.mean(np.asarray(info["accept_rate"]))) > 0.6


@pytest.mark.parametrize("sampler", ["hmc", "nuts"])
def test_collective_sharded_over_restart_axis(sampler):
    """Chains sharded 4-ways over the mesh restart axis; the acceptance /
    variance pooling runs as a cross-device pmean. The adapted step size
    must come back identical on every shard (it is a collective scalar),
    and the pooled samples must still recover the target."""
    logp, mu, A = _corr_gauss()
    mesh = make_mesh(n_data=1, n_restart=4)
    n_shards = 4
    chains_per = 2

    kwargs = dict(
        num_warmup=300, num_samples=400, num_chains=chains_per,
        collective_adapt=True, axis_name=RESTART_AXIS,
    )
    if sampler == "hmc":
        fn = lambda x0, key: hmc_sample(
            logp, x0, key, num_leapfrog=16, **kwargs)
    else:
        fn = lambda x0, key: nuts_sample(logp, x0, key, **kwargs)

    def shard_fn(x0s, keys):
        samples, info = fn(x0s[0], keys[0])
        # eps is pmean-pooled -> already replicated; expose one copy/shard
        return samples, info["accept_rate"], info["step_size"][None]

    run = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(RESTART_AXIS), P(RESTART_AXIS)),
        out_specs=(P(RESTART_AXIS), P(RESTART_AXIS), P(RESTART_AXIS)),
    )
    x0s = jnp.zeros((n_shards, 3))
    keys = jax.random.split(jax.random.PRNGKey(2), n_shards)
    samples, accept, eps = run(x0s, keys)

    eps = np.asarray(eps)
    assert eps.shape == (n_shards,)
    # the shared step size is a collective: identical across shards
    np.testing.assert_allclose(eps, eps[0], rtol=0, atol=0)
    assert np.all(eps > 0)

    samples = np.asarray(samples)  # (n_shards*chains_per, S, 3)
    assert samples.shape[0] == n_shards * chains_per
    flat = samples.reshape(-1, 3)
    assert np.all(np.isfinite(flat))
    np.testing.assert_allclose(flat.mean(0), mu, atol=0.2)
    assert float(np.mean(np.asarray(accept))) > 0.5
