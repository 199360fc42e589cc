"""Checkpoint/resume tests (SURVEY §5: the subsystem the reference lacks)."""

import os

import numpy as np
import pytest

import gpz_tpu
from gpz_tpu.checkpoint import save_model, load_model, train_with_checkpoints


def _toy(rng, n=400):
    X = rng.standard_normal((n, 2))
    Y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(n)
    return X, Y


def test_save_load_roundtrip(rng, tmp_path):
    X, Y = _toy(rng)
    tr, va, te = gpz_tpu.datautils.split(400, 0.7, 0.15, 0.15, rng)
    model = gpz_tpu.init(X, Y, "VD", 8, training=tr, dtype="float64", seed=0)
    model = gpz_tpu.train(model, X, Y, training=tr, validation=va,
                          max_iter=20, verbose=False)
    path = str(tmp_path / "model.npz")
    save_model(model, path)
    loaded = load_model(path)

    assert loaded.cfg == model.cfg
    np.testing.assert_allclose(loaded.muX, model.muX)
    np.testing.assert_allclose(
        np.asarray(loaded.best.params.P), np.asarray(model.best.params.P)
    )
    assert loaded.best.score == model.best.score

    # predictions identical through a round trip
    p1 = gpz_tpu.predict(X[te], model)
    p2 = gpz_tpu.predict(X[te], loaded)
    np.testing.assert_allclose(p1.mu, p2.mu, rtol=1e-12)
    np.testing.assert_allclose(p1.sigma, p2.sigma, rtol=1e-12)


def test_loaded_model_trains_further(rng, tmp_path):
    X, Y = _toy(rng)
    tr, va, _ = gpz_tpu.datautils.split(400, 0.7, 0.15, 0.15, rng)
    model = gpz_tpu.init(X, Y, "VL", 8, training=tr, dtype="float64", seed=0)
    model = gpz_tpu.train(model, X, Y, training=tr, validation=va,
                          max_iter=5, verbose=False)
    path = str(tmp_path / "m.npz")
    save_model(model, path)
    loaded = load_model(path)
    m2 = gpz_tpu.train(loaded, X, Y, training=tr, validation=va,
                       max_iter=10, verbose=False)
    # resumed training preserves or improves best score (ref train.m:8-11)
    assert m2.best.score >= model.best.score - 1e-9


def test_train_with_checkpoints_resumes(rng, tmp_path):
    X, Y = _toy(rng)
    tr, va, _ = gpz_tpu.datautils.split(400, 0.7, 0.15, 0.15, rng)
    model = gpz_tpu.init(X, Y, "VL", 8, training=tr, dtype="float64", seed=0)
    path = str(tmp_path / "ckpt.npz")
    m1 = train_with_checkpoints(
        model, X, Y, checkpoint_path=path, segment_iters=5, max_iter=15,
        training=tr, validation=va, verbose=False,
    )
    assert os.path.exists(path)
    # simulate preemption: reload from disk and continue
    m2 = train_with_checkpoints(
        model, X, Y, checkpoint_path=path, segment_iters=5, max_iter=10,
        training=tr, validation=va, verbose=False,
    )
    assert m2.best.score >= m1.best.score - 1e-6
