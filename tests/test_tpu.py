"""On-TPU tests — compiled-on-silicon checks (VERDICT r2 item 6).

The rest of the suite validates numerics on the virtual CPU mesh
(conftest forces jax_platforms=cpu); this module exercises the paths that
only exist on real hardware: the compiled (non-interpret) Pallas VC kernel,
the mixed-precision objective, the jitted L-BFGS while-loop, and the
prediction stack at the north-star m=1000 scale (BASELINE.json configs[4],
which crashed the TPU worker in round 2).

Run via:  GPZ_TPU_TESTS=1 python -m pytest tests/test_tpu.py -q
(run_tests.py does this automatically as its own batch). Skipped entirely
when no TPU backend is available — including under the default conftest,
which pins the platform to CPU unless GPZ_TPU_TESTS=1.

Reference precedent for validating on the target platform:
minFunc_2012/autoDif/derivativeCheck.m (the reference's whole correctness
method was derivative-checking on the machine it ran on).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="needs a real TPU (set GPZ_TPU_TESTS=1 and run on hardware)",
)


def _vc_problem(n, m, d=5, k=1, seed=0, missing_rows=0):
    from gpz_tpu.config import ModelConfig
    from gpz_tpu.dataset import Dataset
    from gpz_tpu.params import GPzParams

    rng = np.random.default_rng(seed)
    cfg = ModelConfig(m=m, d=d, k=k, method="VC", dtype="float32")
    X = rng.standard_normal((n, d)).astype(np.float32)
    Y = (X @ rng.standard_normal((d, k)) * 0.3
         + 0.1 * rng.standard_normal((n, k))).astype(np.float32)
    psi = np.zeros((n, d, d), np.float32)
    psi[:, np.arange(d), np.arange(d)] = 0.05 + 0.1 * rng.random((n, d))
    mask = np.ones((n, d), bool)
    if missing_rows:
        mask[-missing_rows:, 0] = False
        X = np.where(mask, X, 0.0).astype(np.float32)
    data = Dataset(
        X=jnp.asarray(X), mask=jnp.asarray(mask),
        omega=jnp.ones((n,), jnp.float32),
        Y=jnp.asarray(Y), psi=jnp.asarray(psi),
    )
    gam = np.zeros((m, d, d), np.float32)
    gam[:, np.arange(d), np.arange(d)] = 1.0 + 0.1 * rng.random((m, d))
    params = GPzParams(
        P=jnp.asarray(rng.standard_normal((m, d)).astype(np.float32)),
        gamma=jnp.asarray(gam),
        ln_alpha=jnp.zeros((m, k), jnp.float32),
        b=jnp.zeros((k,), jnp.float32),
        v=jnp.zeros((m, k), jnp.float32),
        ln_tau=jnp.zeros((m, k), jnp.float32),
    )
    return cfg, params, data


def test_pallas_vc_kernel_compiled_fwd_and_grad():
    """The compiled (non-interpret) Pallas kernel against the plain jnp
    path, forward and VJP — the CPU suite only ever runs it in interpret
    mode (tests/test_ops.py)."""
    from gpz_tpu.ops.vc_phi import vc_lnphi_complete
    from gpz_tpu.linalg import safe_cholesky, chol_logdet

    rng = np.random.default_rng(1)
    n, m, d = 300, 40, 5
    X = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    psi = np.zeros((n, d, d), np.float32)
    psi[:, np.arange(d), np.arange(d)] = 0.1 + 0.2 * rng.random((n, d))
    psi = jnp.asarray(psi)
    P = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    gam = 0.8 + 0.4 * rng.random((m, d)).astype(np.float32)
    iSig = jax.vmap(jnp.diag)(jnp.asarray(gam**2))
    L = safe_cholesky(iSig)
    logdet_Sigma = -chol_logdet(L)
    Sigma = jax.vmap(jnp.diag)(jnp.asarray(gam**-2.0))

    def ref_lnphi(P, Sigma, logdet_Sigma):
        A = psi[:, None] + Sigma[None]                      # (n, m, d, d)
        Delta = X[:, None, :] - P[None]
        La = jnp.linalg.cholesky(A)
        z = jax.scipy.linalg.solve_triangular(
            La, Delta[..., None], lower=True
        )[..., 0]
        quad = jnp.sum(z * z, axis=-1)
        ld = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(La, axis1=-2, axis2=-1)), axis=-1
        )
        return -0.5 * quad + 0.5 * logdet_Sigma[None, :] - 0.5 * ld

    out_k = jax.jit(vc_lnphi_complete)(X, psi, P, Sigma, logdet_Sigma)
    out_r = jax.jit(ref_lnphi)(P, Sigma, logdet_Sigma)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_r), atol=5e-4, rtol=1e-3
    )

    def loss_k(P, Sigma, ld):
        return jnp.sum(jnp.exp(vc_lnphi_complete(X, psi, P, Sigma, ld)))

    def loss_r(P, Sigma, ld):
        return jnp.sum(jnp.exp(ref_lnphi(P, Sigma, ld)))

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))(P, Sigma, logdet_Sigma)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(P, Sigma, logdet_Sigma)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=2e-2
        )


def test_lbfgs_mixed_objective_5_iters():
    """Five L-BFGS iterations of the real mixed-mode VC objective on
    silicon: finite, monotone non-increasing trace, healthy status."""
    from gpz_tpu.objective import nlog_ml
    from gpz_tpu.optim import minimize
    from gpz_tpu.optim.lbfgs import (
        STATUS_MAX_ITER, STATUS_OPTIMAL, STATUS_STEP_TOO_SMALL,
    )
    from jax.flatten_util import ravel_pytree

    cfg, params, data = _vc_problem(n=4096, m=32)
    flat0, unravel = ravel_pytree(params)
    vg = jax.value_and_grad(
        lambda p, d: nlog_ml(p, d, cfg, complete=True), has_aux=True
    )

    def fun(x, d):
        (f, aux), g = vg(unravel(x), d)
        return f, ravel_pytree(g)[0], aux

    res = minimize(fun, flat0, args=(data,), max_iter=5)
    n_it = int(res.iterations)
    f = np.asarray(res.trace["f"][: n_it + 1])
    assert np.all(np.isfinite(f))
    assert np.all(np.diff(f) <= 1e-7), f
    assert int(res.status) in (
        STATUS_MAX_ITER, STATUS_OPTIMAL, STATUS_STEP_TOO_SMALL,
    )


def test_predict_small_with_missing_pattern():
    """Train-free predict on silicon: clean + noisy + one missing pattern
    through the public model API."""
    import gpz_tpu

    rng = np.random.default_rng(3)
    n, d = 400, 4
    X = rng.standard_normal((n, d))
    y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(n)
    psi = (0.01 + 0.05 * rng.random((n, d)))
    model = gpz_tpu.init(X, y, "VC", 24, psi=psi, seed=0)

    Xq = rng.standard_normal((64, d))
    Xq[-16:, 1] = np.nan                       # one missing pattern
    psiq = 0.02 * np.ones((64, d))
    pred = gpz_tpu.predict(Xq, model, psi=psiq)
    for name in ("mu", "sigma", "nu", "beta_i", "gamma"):
        v = getattr(pred, name)
        assert np.all(np.isfinite(v)), name
    assert np.all(pred.sigma > 0)


def test_predict_m1000_noisy_missing():
    """The north-star scale config that crashed the TPU worker in round 2
    (BASELINE.json configs[4]; VERDICT r2 weak #6): VC m=1000,
    noisy + missing rows, through the public predict API. Pass = finite
    outputs, no worker crash."""
    import gpz_tpu

    rng = np.random.default_rng(4)
    n, d, m = 2000, 5, 1000
    X = rng.standard_normal((n, d))
    y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(n)
    psi = 0.01 + 0.05 * rng.random((n, d))
    model = gpz_tpu.init(X, y, "VC", m, psi=psi, seed=0)

    nq = 256
    Xq = rng.standard_normal((nq, d))
    Xq[-64:, 2] = np.nan
    psiq = 0.02 * np.ones((nq, d))
    pred = gpz_tpu.predict(Xq, model, psi=psiq)
    assert np.all(np.isfinite(pred.mu))
    assert np.all(np.isfinite(pred.sigma))
    assert np.all(pred.sigma > 0)
