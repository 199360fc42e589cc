"""Pallas TPU kernel for the full-covariance (GC/VC) design matrix.

The hot op of VC training (SURVEY §3.2: the per-sample loop of ref
getPHI.m:80-88): for every (sample i, basis j) pair, with A = Psi_i + Sigma_j,

    lnPHI_ij = -1/2 Delta' A^-1 Delta + 1/2 log|Sigma_j| - 1/2 log|A|

The jnp version materializes (n, m, d, d) intermediates in HBM; this kernel
keeps everything in VMEM: each grid step loads a (BN, d, d) Psi tile and the
(m-minor) basis tables, lays the d x d systems out as d^2 planes of shape
(BN, m) — samples on sublanes, bases on lanes — and runs the d-unrolled
Cholesky + forward substitution as pure VPU arithmetic. HBM traffic drops to
inputs + the (n, m) output.

A custom VJP provides the analytic backward pass as a second kernel that
accumulates dP and dSigma across the (sequential) TPU grid:

    d lnPHI / d P_j      = (A^-1 Delta)
    d lnPHI / d Sigma_j  = 1/2 (A^-1 Delta)(A^-1 Delta)' - 1/2 A^-1
                           (+ 1/2 Sigma^-1 from the log|Sigma| term, added
                            by the caller in JAX)

float32 on TPU; interpret mode (CPU tests) supported. Forward-only parity
and gradient parity are tested against the jnp path in tests/test_ops.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes. The (BN, BM) plane set of the forward kernel must fit Mosaic's
# scoped-VMEM stack budget (16 MB on v5e) *including* the jvp/transpose copies
# XLA adds when the call sits under value_and_grad — BM=256 tiles exceed it.
# Env-tunable for per-chip autotuning.
BN = int(os.environ.get("GPZ_VC_BN", 96))        # row (sublane) tile
BN_BWD = int(os.environ.get("GPZ_VC_BN_BWD", 96))  # backward row tile
BM = int(os.environ.get("GPZ_VC_BM", 128))       # basis (lane) tile


_I0 = np.int32(0)  # index-map literal: i32 even under jax_enable_x64


def pallas_enabled() -> bool:
    """Pallas VC path is OPT-IN via GPZ_ENABLE_PALLAS=1 (TPU only).

    Measured on the driver bench (v5e, VC m=100 n=100k, round-3 session,
    post-mixed-precision): plain XLA path 93-95 grad evals/s vs 53-54 with
    this kernel in the loop — the kernel's unrolled per-plane arithmetic
    beats an (n, m, d, d) HBM materialization only when XLA fails to fuse,
    and current XLA fuses this contraction well. Kept for study and for
    shapes where the (n, m, d^2) intermediates exceed HBM; re-flip only with
    a fresh A/B measurement recorded next to the default.
    """
    if os.environ.get("GPZ_ENABLE_PALLAS") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def _chol_planes(A, d):
    """Unrolled Cholesky on d^2 planes; A[a][b] are (BN, m) arrays."""
    L = [[None] * d for _ in range(d)]
    for j in range(d):
        s = A[j][j]
        for t in range(j):
            s = s - L[j][t] * L[j][t]
        L[j][j] = jnp.sqrt(s)
        for i in range(j + 1, d):
            s2 = A[i][j]
            for t in range(j):
                s2 = s2 - L[i][t] * L[j][t]
            L[i][j] = s2 / L[j][j]
    return L


def _fwd_sub_planes(L, b, d):
    """Solve L z = b; b is a list of d (BN, m) planes."""
    z = []
    for i in range(d):
        s = b[i]
        for t in range(i):
            s = s - L[i][t] * z[t]
        z.append(s / L[i][i])
    return z


def _bwd_sub_planes(L, z, d):
    """Solve L' y = z (backward substitution on planes)."""
    y = [None] * d
    for i in reversed(range(d)):
        s = z[i]
        for t in range(i + 1, d):
            s = s - L[t][i] * y[t]
        y[i] = s / L[i][i]
    return y


def _load_planes(x_ref, psi_ref, p_ref, sigma_ref, d):
    """Shared tile prep: A planes (psi + Sigma broadcast) and Delta planes.

    Only the lower triangle of the symmetric A is materialized — the Cholesky
    reads nothing else, and Mosaic's scoped-VMEM accounting is sensitive to
    the number of live planes.
    """
    A = [[None] * d for _ in range(d)]
    Delta = []
    for a in range(d):
        for b in range(a + 1):
            # psi[:, a, b]: (BN, 1); Sigma_t[a*d+b]: (1, m)
            A[a][b] = (
                psi_ref[:, a, b][:, None] + sigma_ref[a * d + b, :][None, :]
            )
        Delta.append(x_ref[:, a][:, None] - p_ref[a, :][None, :])
    return A, Delta


def _fwd_kernel(x_ref, psi_ref, p_ref, sigma_ref, lds_ref, out_ref, *, d):
    A, Delta = _load_planes(x_ref, psi_ref, p_ref, sigma_ref, d)
    L = _chol_planes(A, d)
    z = _fwd_sub_planes(L, Delta, d)
    quad = z[0] * z[0]
    logdet = jnp.log(L[0][0])
    for i in range(1, d):
        quad = quad + z[i] * z[i]
        logdet = logdet + jnp.log(L[i][i])
    out_ref[:] = -0.5 * quad + 0.5 * lds_ref[0, :][None, :] - logdet


def _bwd_kernel(x_ref, psi_ref, p_ref, sigma_ref, g_ref, dp_ref, dsig_ref,
                *, d):
    i0 = pl.program_id(0)

    @pl.when(i0 == 0)
    def _init():
        dp_ref[:] = jnp.zeros_like(dp_ref)
        dsig_ref[:] = jnp.zeros_like(dsig_ref)

    A, Delta = _load_planes(x_ref, psi_ref, p_ref, sigma_ref, d)
    L = _chol_planes(A, d)
    # h = A^-1 Delta
    z = _fwd_sub_planes(L, Delta, d)
    h = _bwd_sub_planes(L, z, d)
    g = g_ref[:]                                     # (BN, m) cotangent

    # dP_j[a] = sum_n g * h[a]  (reduce over sublanes)
    for a in range(d):
        dp_ref[a, :] += jnp.sum(g * h[a], axis=0)

    # explicit triangular inverse: Linv = L^-1, then A^-1 = Linv' Linv
    Linv = [[None] * d for _ in range(d)]
    for j in range(d):
        Linv[j][j] = 1.0 / L[j][j]
        for i in range(j + 1, d):
            s = L[i][j] * Linv[j][j]
            for t in range(j + 1, i):
                s = s + L[i][t] * Linv[t][j]
            Linv[i][j] = -s / L[i][i]

    for a in range(d):
        for b in range(a, d):
            inv_ab = None
            for t in range(b, d):
                term = Linv[t][a] * Linv[t][b]
                inv_ab = term if inv_ab is None else inv_ab + term
            # dSigma[j, a, b] += sum_n g (1/2 h_a h_b - 1/2 A^-1[a, b])
            contrib = jnp.sum(g * (0.5 * h[a] * h[b] - 0.5 * inv_ab), axis=0)
            dsig_ref[a * d + b, :] += contrib
            if b != a:
                dsig_ref[b * d + a, :] += contrib


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def vc_lnphi_complete(X, psi, P, Sigma, logdet_Sigma):
    """lnPHI (n, m) for complete data with full-covariance input noise.

    X (n, d); psi (n, d, d); P (m, d); Sigma (m, d, d);
    logdet_Sigma (m,). Differentiable in P / Sigma / logdet_Sigma only
    (X and psi are data).
    """
    out, _ = _vc_fwd(X, psi, P, Sigma, logdet_Sigma)
    return out


def _pad_rows(X, psi, bn):
    n = X.shape[0]
    n_pad = -(-n // bn) * bn
    if n_pad != n:
        X = jnp.pad(X, ((0, n_pad - n), (0, 0)))
        psi = jnp.pad(psi, ((0, n_pad - n), (0, 0), (0, 0)))
    return X, psi, n, n_pad


def _pad_bases(P_t, Sigma_t, lds, m):
    """Pad the basis (lane) axis to a BM multiple. Padded bases get
    Sigma = I (so the factorization stays finite); their lnPHI columns and
    gradient columns are sliced away by the wrappers."""
    m_pad = -(-m // BM) * BM
    if m_pad == m:
        return P_t, Sigma_t, lds, m_pad
    d = P_t.shape[0]
    pad = m_pad - m
    P_t = jnp.pad(P_t, ((0, 0), (0, pad)))
    eye_cols = jnp.tile(
        jnp.eye(d, dtype=Sigma_t.dtype).reshape(d * d, 1), (1, pad)
    )
    Sigma_t = jnp.concatenate([Sigma_t, eye_cols], axis=1)
    lds = jnp.pad(lds, ((0, 0), (0, pad)))
    return P_t, Sigma_t, lds, m_pad


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vc_fwd(X, psi, P, Sigma, logdet_Sigma):
    n0, d = X.shape
    m = P.shape[0]
    X, psi, n, n_pad = _pad_rows(X, psi, BN)
    P_t = P.T                                    # (d, m)
    Sigma_t = Sigma.reshape(m, d * d).T          # (d^2, m)
    lds = logdet_Sigma[None, :]                  # (1, m)
    P_t, Sigma_t, lds, m_pad = _pad_bases(P_t, Sigma_t, lds, m)
    bm = min(BM, m_pad)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, d=d),
        grid=(n_pad // BN, m_pad // bm),
        in_specs=[
            pl.BlockSpec((BN, d), lambda i, j: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, d, d), lambda i, j: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bm), lambda i, j: (_I0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d * d, bm), lambda i, j: (_I0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (_I0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BN, bm), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), X.dtype),
        interpret=_interpret(),
    )(X, psi, P_t, Sigma_t, lds)
    out = out[:n0, :m]
    return out, (X, psi, P_t, Sigma_t, n0, n_pad)


def _vc_bwd(res, g):
    X, psi, P_t, Sigma_t, n0, n_pad = res
    d = X.shape[1]
    m_pad = P_t.shape[1]                          # already lane-padded
    m = g.shape[1]
    # re-pad to the (smaller) backward tile
    X, psi, _, n_pad = _pad_rows(X[:n0], psi[:n0], BN_BWD)
    g_pad = jnp.pad(g, ((0, n_pad - n0), (0, m_pad - m)))
    bm = min(BM, m_pad)

    dp_t, dsig_t = pl.pallas_call(
        functools.partial(_bwd_kernel, d=d),
        grid=(n_pad // BN_BWD, m_pad // bm),
        in_specs=[
            pl.BlockSpec((BN_BWD, d), lambda i, j: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN_BWD, d, d), lambda i, j: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bm), lambda i, j: (_I0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d * d, bm), lambda i, j: (_I0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN_BWD, bm), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d, bm), lambda i, j: (_I0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d * d, bm), lambda i, j: (_I0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, m_pad), X.dtype),
            jax.ShapeDtypeStruct((d * d, m_pad), X.dtype),
        ],
        interpret=_interpret(),
    )(X, psi, P_t, Sigma_t, g_pad)

    dP = dp_t[:, :m].T                            # (m, d)
    dSigma = dsig_t[:, :m].T.reshape(m, d, d)
    d_logdet = 0.5 * jnp.sum(g, axis=0)           # (m,)
    dX = jnp.zeros((n0, d), X.dtype)
    dpsi = jnp.zeros((n0, d, d), X.dtype)
    return dX, dpsi, dP, dSigma, d_logdet


vc_lnphi_complete.defvjp(_vc_fwd, _vc_bwd)
