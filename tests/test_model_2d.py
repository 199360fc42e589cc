"""End-to-end 2-D integration test (ref demo_2D.m): GMM surface, input noise,
missing-at-random features, and fully-missing-column prediction vs a model
retrained on the observed column only."""

import numpy as np
import pytest

import gpz_tpu


@pytest.fixture(scope="module")
def data_2d():
    rng = np.random.default_rng(1)
    means = [np.array([10.0, 0]), np.array([10.0, 10]), np.array([5.0, 5])]
    covs = [
        np.array([[10.0, 0], [0, 1]]),
        np.array([[5.0, -3], [-3, 3]]),
        np.array([[2.0, 0], [0, 2]]),
    ]
    X = np.vstack(
        [rng.multivariate_normal(mu, C, 700) for mu, C in zip(means, covs)]
    )
    n = X.shape[0]

    def mvnpdf(x, mu, C):
        diff = x - mu
        q = np.einsum("nd,de,ne->n", diff, np.linalg.inv(C), diff)
        return np.exp(-0.5 * q) / (2 * np.pi * np.sqrt(np.linalg.det(C)))

    PHI = np.stack([mvnpdf(X, mu, C) for mu, C in zip(means, covs)], axis=1)
    w = np.array([-9.0, 6.0, 3.0])
    Y = PHI @ w + rng.standard_normal(n) * 0.01

    psi = rng.gamma(1.0, 0.5, size=(n, 2))
    Xn = X + rng.standard_normal((n, 2)) * np.sqrt(psi)

    # delete one variable from half of 40% of rows
    r = rng.permutation(n)
    psize = int(0.2 * n)
    Xn[r[:psize], 0] = np.nan
    Xn[r[psize : 2 * psize], 1] = np.nan

    tr, va, te = gpz_tpu.datautils.split(n, 0.7, 0.15, 0.15, rng)
    return X, Xn, Y, psi, tr, va, te


@pytest.fixture(scope="module")
def model_2d(data_2d):
    X, Xn, Y, psi, tr, va, te = data_2d
    model = gpz_tpu.init(
        Xn, Y, "VD", 25, heteroscedastic=True, training=tr, psi=psi,
        seed=1, dtype="float64",
    )
    return gpz_tpu.train(
        model, Xn, Y, training=tr, validation=va, psi=psi,
        max_iter=100, max_attempts=25, verbose=False,
    )


def test_trains_with_missing_and_noise(model_2d):
    tr_f = model_2d.fit_info["trace"]["f"]
    n_it = model_2d.fit_info["iterations"]
    assert n_it > 5
    assert tr_f[n_it] < tr_f[0]


def test_predicts_complete_rows(data_2d, model_2d):
    X, Xn, Y, psi, tr, va, te = data_2d
    pred = gpz_tpu.predict(Xn, model_2d, psi=psi, selection=te)
    keep = ~np.isnan(Xn[te]).any(axis=1)
    err = Y[te][keep] - pred.mu[keep, 0]
    rmse = np.sqrt(np.mean(err**2))
    base = np.std(Y[te][keep])
    assert rmse < 0.6 * base, (rmse, base)


def test_predicts_rows_with_missing_values(data_2d, model_2d):
    X, Xn, Y, psi, tr, va, te = data_2d
    pred = gpz_tpu.predict(Xn, model_2d, psi=psi, selection=te)
    miss = np.isnan(Xn[te]).any(axis=1)
    assert miss.any()
    err = Y[te][miss] - pred.mu[miss, 0]
    # predictions with one variable missing remain informative
    assert np.sqrt(np.mean(err**2)) < np.std(Y[te][miss])
    assert np.all(pred.sigma[miss, 0] > 0)
    # uncertainty should on average exceed the complete-row uncertainty
    assert pred.sigma[miss, 0].mean() > pred.sigma[~miss, 0].mean()


def test_fully_missing_column_vs_retrained_reference(data_2d, model_2d):
    """The GMM-conditioned prediction with a column fully missing should be
    within ~2x RMSE of a model retrained on the observed column only
    (ref demo_2D.m:132-213)."""
    X, Xn, Y, psi, tr, va, te = data_2d
    for o in range(2):
        Xs = np.full((te.sum(), 2), np.nan)
        Xs[:, o] = X[te, o]
        mu = gpz_tpu.predict(Xs, model_2d).mu[:, 0]
        rmse_cond = np.sqrt(np.mean((Y[te] - mu) ** 2))

        removed = np.isnan(Xn[:, o])
        ref = gpz_tpu.init(
            Xn[:, o : o + 1], Y, "VD", 25, heteroscedastic=True,
            training=tr & ~removed, psi=psi[:, o], seed=1, dtype="float64",
        )
        ref = gpz_tpu.train(
            ref, Xn[:, o : o + 1], Y, training=tr & ~removed,
            validation=va & ~removed, psi=psi[:, o],
            max_iter=100, max_attempts=25, verbose=False,
        )
        mu_ref = gpz_tpu.predict(X[te, o : o + 1], ref).mu[:, 0]
        rmse_ref = np.sqrt(np.mean((Y[te] - mu_ref) ** 2))
        assert rmse_cond < 2.0 * rmse_ref + 0.1, (o, rmse_cond, rmse_ref)
