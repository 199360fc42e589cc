"""Design-matrix parity: masked JAX log_phi vs the loopy float64 port-of-record,
across all 6 methods x {psi, no psi} x {missing, complete}."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpz_tpu.config import ModelConfig
from gpz_tpu.params import GPzParams
from gpz_tpu.phi import log_phi

from reference_impl import ref_log_phi

METHODS = ["GL", "VL", "GD", "VD", "GC", "VC"]


def make_params(rng, cfg):
    m, d, k = cfg.m, cfg.d, cfg.k
    P = rng.standard_normal((m, d))
    shape = cfg.gamma_shape
    if cfg.full_cov:
        # well-conditioned factor: diagonal-dominant
        g = rng.standard_normal(shape) * 0.1
        idx = np.arange(d)
        g[..., idx, idx] += 1.0 + rng.random(shape[:-2] + (d,))
    else:
        g = 0.5 + rng.random(shape)
    return GPzParams(
        P=jnp.asarray(P),
        gamma=jnp.asarray(g),
        ln_alpha=jnp.asarray(rng.standard_normal((m, k))),
        b=jnp.asarray(rng.standard_normal(k)),
        v=jnp.asarray(rng.standard_normal((m, k)) * 0.1),
        ln_tau=jnp.asarray(rng.standard_normal((m, k)) * 0.1),
    )


def make_data(rng, n, d, with_psi, with_missing, full_cov):
    X = rng.standard_normal((n, d))
    if with_missing:
        drop = rng.random((n, d)) < 0.3
        # never drop every dim of a row
        drop[drop.all(axis=1), 0] = False
        X[drop] = np.nan
    if with_psi:
        if full_cov:
            A = rng.standard_normal((n, d, d)) * 0.3
            psi = A @ np.swapaxes(A, 1, 2) + 0.1 * np.eye(d)
        else:
            psi = 0.1 + rng.random((n, d))
    else:
        psi = None
    return X, psi


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("with_psi", [False, True])
@pytest.mark.parametrize("with_missing", [False, True])
def test_log_phi_parity(rng, method, with_psi, with_missing):
    n, d, m = 17, 3, 5
    cfg = ModelConfig(m=m, d=d, k=1, method=method, dtype="float64")
    params = make_params(rng, cfg)
    X, psi = make_data(rng, n, d, with_psi, with_missing, cfg.full_cov)

    exp_phi, exp_n = ref_log_phi(X, psi, np.asarray(params.P), np.asarray(params.gamma), method)

    mask = ~np.isnan(X)
    Xz = np.where(mask, X, 0.0)
    got_phi, got_n = log_phi(
        params,
        cfg,
        jnp.asarray(Xz),
        jnp.asarray(mask),
        None if psi is None else jnp.asarray(psi),
        complete=not with_missing,
    )
    np.testing.assert_allclose(np.asarray(got_phi), exp_phi, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got_n), exp_n, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("method", ["VD", "VC"])
def test_log_phi_masked_vs_complete_consistency(rng, method):
    """complete=True and complete=False must agree when nothing is missing."""
    n, d, m = 11, 3, 4
    cfg = ModelConfig(m=m, d=d, k=1, method=method, dtype="float64")
    params = make_params(rng, cfg)
    X, psi = make_data(rng, n, d, True, False, cfg.full_cov)
    mask = jnp.ones((n, d), dtype=bool)
    a = log_phi(params, cfg, jnp.asarray(X), mask, jnp.asarray(psi), complete=True)
    b = log_phi(params, cfg, jnp.asarray(X), mask, jnp.asarray(psi), complete=False)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), rtol=1e-8)
