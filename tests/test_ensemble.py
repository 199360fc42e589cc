"""Vmapped multi-restart training, including restart-axis sharding."""

import numpy as np
import jax
import pytest

import gpz_tpu
from gpz_tpu.ensemble import fit_ensemble
from gpz_tpu.parallel import make_mesh


def _toy(rng, n=500):
    X = rng.standard_normal((n, 2))
    Y = np.sin(X[:, 0] * 2) + 0.3 * X[:, 1] + 0.1 * rng.standard_normal(n)
    return X, Y


def test_ensemble_picks_best_restart(rng):
    X, Y = _toy(rng)
    tr, va, te = gpz_tpu.datautils.split(500, 0.6, 0.2, 0.2, rng)
    model, info = fit_ensemble(
        X, Y, "VL", 8, n_restarts=3, training=tr, validation=va,
        max_iter=25, seed=0, dtype="float64",
    )
    scores = info["restart_scores"]
    assert len(scores) == 3
    assert model.best.score == pytest.approx(scores.max())
    # the ensemble-best should predict sensibly
    pred = gpz_tpu.predict(X[te], model)
    rmse = np.sqrt(np.mean((Y[te] - pred.mu[:, 0]) ** 2))
    assert rmse < np.std(Y[te])


def test_ensemble_restart_sharded(rng):
    X, Y = _toy(rng, n=320)
    tr, va, _ = gpz_tpu.datautils.split(320, 0.6, 0.2, 0.2, rng)
    mesh = make_mesh(n_data=2, n_restart=4)
    model, info = fit_ensemble(
        X, Y, "VL", 6, n_restarts=4, training=tr, validation=va,
        max_iter=10, seed=1, dtype="float64", mesh=mesh,
    )
    assert len(info["restart_scores"]) == 4
    assert np.isfinite(model.best.score)
