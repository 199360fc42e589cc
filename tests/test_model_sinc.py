"""End-to-end integration: the sinc demo (ref demo_sinc.m) as a seeded test.

1-D sinc + heteroscedastic noise + gamma-distributed input noise, gap in the
training support. Checks: training improves log-ML, test metrics in a sane
band, and the model variance `nu` grows off-support (the reference's visual
gap test, demo_sinc.m:32)."""

import numpy as np
import pytest

import gpz_tpu


def make_sinc(rng, n=3000, input_noise=True):
    fx = lambda x: np.sinc(x / np.pi)  # MATLAB sinc(x) = sin(pi x)/(pi x)...
    # ref demo uses MATLAB sinc(x) = sin(pi x)/(pi x); exact form is not
    # important for the test — keep np.sinc on x/pi ~ sin(x)/x
    sx = lambda x: 0.05 + (1 / (1 + np.exp(-0.2 * x))) * (1 + np.sin(2 * x)) * 0.2
    X = np.linspace(-10, 10, n)
    X = X[(X < -7) | (X > -2)]
    n = len(X)
    Y = fx(X) + rng.standard_normal(n) * sx(X)
    if input_noise:
        E, V = 0.5, 0.25
        a, b = E**2 / V, V / E
        psi = rng.gamma(a, b, size=n)
        X = X + rng.standard_normal(n) * np.sqrt(psi)
    else:
        psi = None
    return X[:, None], Y, psi


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(1)
    X, Y, psi = make_sinc(rng)
    n = len(Y)
    tr, va, te = gpz_tpu.datautils.split(n, 0.7, 0.15, 0.15, rng)
    model = gpz_tpu.init(
        X, Y, "VL", 25, heteroscedastic=True, training=tr, psi=psi,
        seed=1, dtype="float64",
    )
    model = gpz_tpu.train(
        model, X, Y, training=tr, validation=va, psi=psi,
        max_iter=150, max_attempts=30, verbose=False,
    )
    return model, X, Y, psi, te


def test_training_converges(trained):
    model, *_ = trained
    tr = model.fit_info["trace"]["f"]
    n_it = model.fit_info["iterations"]
    assert n_it > 10
    # nlml strictly improved from init
    assert tr[n_it] < tr[0] - 0.1


def test_test_set_metrics(trained):
    model, X, Y, psi, te = trained
    pred = gpz_tpu.predict(X, model, psi=psi, selection=te)
    err = Y[te] - pred.mu[:, 0]
    rmse = np.sqrt(np.mean(err**2))
    mll = np.mean(
        -0.5 * err**2 / pred.sigma[:, 0]
        - 0.5 * np.log(pred.sigma[:, 0])
    ) - 0.5 * np.log(2 * np.pi)
    # noise floor: output noise ~0.05-0.45, input noise inflates further
    assert rmse < 0.45, rmse
    assert mll > -0.8, mll
    # calibration sanity: |err| < 3 sigma for ~99% of points
    frac = np.mean(np.abs(err) < 3 * np.sqrt(pred.sigma[:, 0]))
    assert frac > 0.95


def test_nu_grows_in_gap(trained):
    """Training support is x < -7 or x > -2: model variance nu must be larger
    inside the unsupported gap (-7, -2) than over dense data (0, 5)."""
    model, *_ = trained
    Xs = np.linspace(-15, 15, 500)[:, None]
    pred = gpz_tpu.predict(Xs, model)
    gap = (Xs[:, 0] > -6.0) & (Xs[:, 0] < -3.0)
    dense = (Xs[:, 0] > 0.0) & (Xs[:, 0] < 5.0)
    assert pred.nu[gap, 0].mean() > 3 * pred.nu[dense, 0].mean()


def test_best_at_least_as_good_as_last(trained):
    model, X, Y, psi, te = trained
    assert np.isfinite(model.best.score)
    # best was selected on validation LL; verify it is sane on test too
    pb = gpz_tpu.predict(X, model, psi=psi, selection=te, which_set="best")
    pl = gpz_tpu.predict(X, model, psi=psi, selection=te, which_set="last")
    rb = np.sqrt(np.mean((Y[te] - pb.mu[:, 0]) ** 2))
    rl = np.sqrt(np.mean((Y[te] - pl.mu[:, 0]) ** 2))
    assert rb < rl * 1.5  # best should not be drastically worse


def test_retrain_continues(trained):
    """train() restarts from last and preserves best (ref train.m:8-11)."""
    model, X, Y, psi, te = trained
    rng = np.random.default_rng(2)
    n = len(Y)
    tr, va, _ = gpz_tpu.datautils.split(n, 0.7, 0.15, 0.15, rng)
    m2 = gpz_tpu.train(
        model, X, Y, training=tr, validation=va, psi=psi,
        max_iter=5, verbose=False,
    )
    assert m2.best.score >= model.best.score - 1e-9


def test_init_shapes_all_methods(rng):
    """init produces the correct canonical Gamma shape and a working
    posterior for every method (ref init.m:65-86 shape table)."""
    import gpz_tpu
    from gpz_tpu.config import ModelConfig

    X = rng.standard_normal((60, 3))
    Y = np.sin(X[:, 0])
    for method in ["GL", "VL", "GD", "VD", "GC", "VC"]:
        model = gpz_tpu.init(X, Y, method, 4, dtype="float64", seed=0)
        cfg = model.cfg
        assert cfg.method == method
        assert model.last.params.gamma.shape == cfg.gamma_shape
        assert np.all(np.isfinite(np.asarray(model.last.post.w)))


def test_stitch_phase_traces_structure():
    """The two-phase trace stitch that time_to_target's wall-clock
    attribution depends on: row count it1+it2+2 (switch-point re-eval row
    kept), fevals renumbered by the phase-1 running count with the -1
    unrecorded sentinel preserved (VERDICT r3 weak #8)."""
    import numpy as np
    from gpz_tpu.model import stitch_phase_traces

    rec = 8
    t1 = {
        "f": np.array([5.0, 4.0, 3.0, np.nan, np.nan, np.nan, np.nan,
                       np.nan]),
        "fevals": np.array([1, 3, 6, -1, -1, -1, -1, -1], np.int32),
    }
    it1 = 2  # phase 1 stopped after 2 iterations -> rows 0..2 are real
    t2 = {
        "f": np.array([3.1, 2.5, 2.0, np.nan, np.nan, np.nan, np.nan,
                       np.nan]),
        "fevals": np.array([1, 4, 7, -1, -1, -1, -1, -1], np.int32),
    }
    it2 = 2

    trace, iters, fevals = stitch_phase_traces(t1, it1, t2, it2,
                                               fun_evals2=7)
    assert iters == it1 + it2 + 1 == 5
    # rows: phase-1 0..2, then phase-2 0..2 (row 3 = switch-point re-eval)
    np.testing.assert_array_equal(trace["f"],
                                  [5.0, 4.0, 3.0, 3.1, 2.5, 2.0])
    # fevals: phase-2 counters continue from phase-1's 6; -1 stays -1
    np.testing.assert_array_equal(trace["fevals"], [1, 3, 6, 7, 10, 13])
    assert fevals == 7 + 6  # phase-2 total + phase-1 running count
    # cumulative eval counts must be strictly increasing across the stitch
    assert np.all(np.diff(trace["fevals"]) > 0)


def test_stitch_preserves_unrecorded_sentinel():
    import numpy as np
    from gpz_tpu.model import stitch_phase_traces

    t1 = {"f": np.array([2.0, 1.0]), "fevals": np.array([1, 2], np.int32)}
    t2 = {"f": np.array([1.0, 0.5, np.nan]),
          "fevals": np.array([1, -1, -1], np.int32)}
    trace, iters, _ = stitch_phase_traces(t1, 1, t2, 2, fun_evals2=5)
    np.testing.assert_array_equal(trace["fevals"], [1, 2, 3, -1, -1])
    assert iters == 4


def test_sample_weights_matches_posterior_moments(trained):
    # the posterior-sample draw of ref demo_sinc.m:77-87: ws ~ N(w, iSigma_w)
    model = trained[0]
    S = 20_000
    ws = gpz_tpu.sample_weights(model, n_samples=S, seed=3)   # (m, k, S)
    w = np.asarray(model.best.post.w, dtype=np.float64)
    C = np.asarray(model.best.post.iSigma_w, dtype=np.float64)[0]
    m = w.shape[0]
    assert ws.shape == (m, 1, S)
    draws = ws[:, 0, :]
    scale = np.sqrt(np.diag(C))
    # sample mean -> w at the 1/sqrt(S) rate (5-sigma band ~ 0.035 scales)
    err = np.abs(draws.mean(axis=1) - w[:, 0]) / (scale + 1e-12)
    assert np.all(err < 5.0 / np.sqrt(S)), err.max()
    # sample covariance -> iSigma_w (relative to the diagonal scale)
    emp = np.cov(draws)
    denom = np.outer(scale, scale) + 1e-12
    assert np.max(np.abs(emp - C) / denom) < 0.15


def test_sample_weights_seed_reproducible(trained):
    model = trained[0]
    a = gpz_tpu.sample_weights(model, n_samples=4, seed=7)
    b = gpz_tpu.sample_weights(model, n_samples=4, seed=7)
    np.testing.assert_array_equal(a, b)
