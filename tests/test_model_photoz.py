"""Photo-z integration test (ref demo_photoz.m): VC covariances, input-noise
propagation, cost-sensitive weights, cumulative-confidence metrics."""

import numpy as np
import pytest

import gpz_tpu
from gpz_tpu.data import synthetic_sdss
from gpz_tpu import metrics as M


@pytest.fixture(scope="module")
def photoz():
    mags, errs, z = synthetic_sdss(n=4000, seed=3)
    n = len(z)
    rng = np.random.default_rng(3)
    omega = gpz_tpu.datautils.get_omega(z, "normalized")
    psi = errs**2
    tr, va, te = gpz_tpu.datautils.split(n, 0.4, 0.2, 0.4, rng)
    model = gpz_tpu.init(
        mags, z, "VC", 20, omega=omega, training=tr, heteroscedastic=True,
        psi=psi, seed=3, dtype="float64",
    )
    model = gpz_tpu.train(
        model, mags, z, omega=omega, training=tr, validation=va, psi=psi,
        max_iter=80, max_attempts=20, verbose=False,
    )
    pred = gpz_tpu.predict(mags, model, psi=psi, selection=te)
    return z[te], pred, model


def test_vc_photoz_quality(photoz):
    y, pred, model = photoz
    mu, sigma = pred.mu[:, 0], pred.sigma[:, 0]
    rmse = np.sqrt(np.mean((y - mu) ** 2))
    # must clearly beat predicting the mean redshift
    assert rmse < 0.6 * np.std(y), (rmse, np.std(y))
    assert np.all(sigma > 0)


def test_uncertainty_decomposition(photoz):
    y, pred, model = photoz
    np.testing.assert_allclose(
        pred.sigma, pred.nu + pred.beta_i + pred.gamma, rtol=1e-10
    )
    assert np.all(pred.beta_i > 0)
    assert np.all(pred.nu >= -1e-9)
    # input noise must contribute: gamma nonzero somewhere
    assert np.abs(pred.gamma).max() > 0


def test_confidence_ordering(photoz):
    """The confidence-ordered cumulative RMSE curve should be increasing-ish:
    the most-confident predictions are the most accurate (ref metrics.m)."""
    y, pred, model = photoz
    curve = M.rmse_curve(y, pred.mu[:, 0], pred.sigma[:, 0])
    n = len(curve)
    first_decile = curve[max(1, n // 10)]
    assert first_decile < curve[-1] * 1.05, (first_decile, curve[-1])


def test_balanced_omega_changes_fit():
    mags, errs, z = synthetic_sdss(n=1500, seed=4)
    rng = np.random.default_rng(4)
    tr, va, te = gpz_tpu.datautils.split(len(z), 0.5, 0.25, 0.25, rng)
    psi = errs**2
    kw = dict(heteroscedastic=True, training=tr, psi=psi, seed=4, dtype="float64")
    m1 = gpz_tpu.init(mags, z, "VD", 10, **kw)
    m1 = gpz_tpu.train(m1, mags, z, training=tr, validation=va, psi=psi,
                       max_iter=30, verbose=False)
    omega = gpz_tpu.datautils.get_omega(z, "balanced", 0.1)
    m2 = gpz_tpu.init(mags, z, "VD", 10, omega=omega, **kw)
    m2 = gpz_tpu.train(m2, mags, z, omega=omega, training=tr, validation=va,
                       psi=psi, max_iter=30, verbose=False)
    p1 = gpz_tpu.predict(mags, m1, psi=psi, selection=te).mu[:, 0]
    p2 = gpz_tpu.predict(mags, m2, psi=psi, selection=te).mu[:, 0]
    assert not np.allclose(p1, p2)
