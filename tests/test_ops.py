"""Pallas kernel parity tests (interpret mode on CPU): the fused VC design
matrix forward + analytic backward vs the jnp reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpz_tpu.ops.vc_phi import vc_lnphi_complete


def make_inputs(rng, n=37, d=3, m=5, dtype=np.float64):
    X = rng.standard_normal((n, d)).astype(dtype)
    A = rng.standard_normal((n, d, d)).astype(dtype) * 0.3
    psi = A @ np.swapaxes(A, 1, 2) + 0.2 * np.eye(d, dtype=dtype)
    P = rng.standard_normal((m, d)).astype(dtype)
    B = rng.standard_normal((m, d, d)).astype(dtype) * 0.2
    Sigma = B @ np.swapaxes(B, 1, 2) + 0.5 * np.eye(d, dtype=dtype)
    logdet = np.linalg.slogdet(Sigma)[1].astype(dtype)
    return map(jnp.asarray, (X, psi, P, Sigma, logdet))


def ref_lnphi(X, psi, P, Sigma, logdet_Sigma):
    A = psi[:, None] + Sigma[None]
    delta = X[:, None, :] - P[None, :, :]
    sol = jnp.linalg.solve(A, delta[..., None])[..., 0]
    quad = jnp.sum(sol * delta, -1)
    _, ld = jnp.linalg.slogdet(A)
    return -0.5 * quad + 0.5 * logdet_Sigma[None, :] - 0.5 * ld


def test_forward_parity(rng):
    X, psi, P, Sigma, logdet = make_inputs(rng)
    got = vc_lnphi_complete(X, psi, P, Sigma, logdet)
    want = ref_lnphi(X, psi, P, Sigma, logdet)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-8, atol=1e-10)


def test_forward_parity_row_padding(rng):
    # n not a multiple of the tile size exercises the padding path
    X, psi, P, Sigma, logdet = make_inputs(rng, n=300, m=7)
    got = vc_lnphi_complete(X, psi, P, Sigma, logdet)
    want = ref_lnphi(X, psi, P, Sigma, logdet)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-8, atol=1e-10)


def test_backward_parity(rng):
    X, psi, P, Sigma, logdet = make_inputs(rng, n=29, d=3, m=4)
    w = jnp.asarray(rng.standard_normal((29, 4)))

    def loss_pallas(P, Sigma, logdet):
        return jnp.sum(vc_lnphi_complete(X, psi, P, Sigma, logdet) * w)

    def loss_ref(P, Sigma, logdet):
        return jnp.sum(ref_lnphi(X, psi, P, Sigma, logdet) * w)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(P, Sigma, logdet)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(P, Sigma, logdet)
    for a, b, name in zip(g1, g2, ["dP", "dSigma", "dlogdet"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9, err_msg=name)


def test_integrates_with_objective_grad(rng):
    """End-to-end: gradient of a scalar through the kernel is finite and
    matches finite differences."""
    X, psi, P, Sigma, logdet = make_inputs(rng, n=20, d=2, m=3)

    def f(P):
        return jnp.sum(jnp.exp(vc_lnphi_complete(X, psi, P, Sigma, logdet)))

    g = jax.grad(f)(P)
    eps = 1e-6
    fd = np.zeros_like(np.asarray(P))
    for i in range(P.shape[0]):
        for j in range(P.shape[1]):
            e = jnp.zeros_like(P).at[i, j].set(eps)
            fd[i, j] = (float(f(P + e)) - float(f(P - e))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), fd, rtol=1e-4, atol=1e-8)


def test_forward_parity_m_tiling(rng):
    """m larger than one basis tile exercises the lane-axis grid."""
    from gpz_tpu.ops import vc_phi
    old = vc_phi.BM
    vc_phi.BM = 4  # force multiple basis tiles in interpret mode
    try:
        X, psi, P, Sigma, logdet = make_inputs(rng, n=23, d=3, m=11)
        got = vc_lnphi_complete(X, psi, P, Sigma, logdet)
        want = ref_lnphi(X, psi, P, Sigma, logdet)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-8, atol=1e-10)
        # gradient through the tiled backward
        w = jnp.asarray(rng.standard_normal((23, 11)))
        g1 = jax.grad(lambda S: jnp.sum(vc_lnphi_complete(X, psi, P, S, logdet) * w))(Sigma)
        g2 = jax.grad(lambda S: jnp.sum(ref_lnphi(X, psi, P, S, logdet) * w))(Sigma)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-7, atol=1e-9)
    finally:
        vc_phi.BM = old
