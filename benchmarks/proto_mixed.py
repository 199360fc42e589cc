"""Prototype of the restructured mixed-precision objective (round 2).

Measures fwd+grad of nlog_ml variants on the real chip:
  A. shipped (f64 preferred_element_type einsum + 8-probe safe_cholesky)
  B. blockwise f32 Gram -> f64 accum, single f64 cholesky
  C. like B but f32 cholesky + one f64 iterative-refinement step for w
"""

import os
import sys
import time
import math

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_problem
from gpz_tpu.objective import nlog_ml
from gpz_tpu.phi import design_matrix
from gpz_tpu.linalg import chol_logdet, chol_solve

_LN2PI = math.log(2.0 * math.pi)
GRAM_BLOCK = 8192


def blockwise_gram(PHI, ob, Y, sdt):
    """(A, rhs, obyy) accumulated: f32 MXU per block, sdt across blocks."""
    n, m = PHI.shape
    k = ob.shape[1]
    B = min(GRAM_BLOCK, n)
    nb = -(-n // B)
    npad = nb * B
    if npad != n:
        PHI = jnp.pad(PHI, ((0, npad - n), (0, 0)))
        ob = jnp.pad(ob, ((0, npad - n), (0, 0)))
        Y = jnp.pad(Y, ((0, npad - n), (0, 0)))
    Pb = PHI.reshape(nb, B, m)
    obb = ob.reshape(nb, B, k)
    Yb = Y.reshape(nb, B, k)
    W = Pb[:, :, None, :] * obb[:, :, :, None]        # (nb, B, k, m)
    A = jnp.einsum("bnkm,bnj->bkmj", W, Pb,
                   precision=jax.lax.Precision.HIGHEST)
    rhs = jnp.einsum("bnkm,bnk->bmk", W, Yb,
                     precision=jax.lax.Precision.HIGHEST)
    obyy = jnp.einsum("bnk,bnk->bk", obb * Yb, Yb,
                      precision=jax.lax.Precision.HIGHEST)
    return (jnp.sum(A.astype(sdt), 0), jnp.sum(rhs.astype(sdt), 0),
            jnp.sum(obyy.astype(sdt), 0))


def nlog_ml_mixed(params, data, cfg, chol_dtype, complete=True):
    sdt = jnp.float64
    n_eff = jnp.asarray(data.n, sdt)
    k = cfg.k
    PHI, _, ln_beta = design_matrix(params, cfg, data.X, data.mask, data.psi,
                                    complete)
    beta = jnp.exp(-ln_beta)
    ob = data.omega[:, None] * beta
    alpha = jnp.exp(params.ln_alpha.astype(sdt))

    A, rhs, obyy = blockwise_gram(PHI, ob, data.Y, sdt)
    SIGMA = A + jax.vmap(jnp.diag)(alpha.T)           # (k, m, m) f64

    if chol_dtype == jnp.float64:
        L = jnp.linalg.cholesky(SIGMA)
        logdet = chol_logdet(L)
        w = chol_solve(L, rhs.T[..., None])[..., 0].T
    else:
        L32 = jnp.linalg.cholesky(SIGMA.astype(jnp.float32))
        logdet = chol_logdet(L32).astype(sdt)
        w0 = chol_solve(L32, rhs.astype(jnp.float32).T[..., None])
        w0 = w0[..., 0].T.astype(sdt)                 # (m, k)
        # one f64 refinement step: r = rhs - SIGMA w0 (tiny m x m f64 matmul)
        r = rhs - jnp.einsum("kmj,jk->mk", SIGMA, w0)
        dw = chol_solve(L32, r.astype(jnp.float32).T[..., None])
        w = w0 + dw[..., 0].T.astype(sdt)

    wrhs = jnp.sum(w * rhs, axis=0)
    aw2 = jnp.sum(alpha * w**2, axis=0)
    quad = obyy[..., :] if obyy.ndim else obyy
    quad = obyy - wrhs - aw2

    log_ml = (
        -0.5 * quad - 0.5 * aw2
        + 0.5 * jnp.sum(params.ln_alpha.astype(sdt), axis=0)
        - 0.5 * logdet
        - 0.5 * jnp.sum(ln_beta * data.omega[:, None], axis=0, dtype=sdt)
    )
    if params.heteroscedastic:
        tau = jnp.exp(params.ln_tau.astype(sdt))
        log_ml = log_ml + (
            -0.5 * jnp.sum(params.v.astype(sdt) ** 2 * tau, axis=0)
            + 0.5 * jnp.sum(params.ln_tau.astype(sdt), axis=0)
            - 0.5 * cfg.m * _LN2PI
        )
    total = jnp.sum(log_ml) - 0.5 * _LN2PI * k * jnp.sum(data.omega, dtype=sdt)
    return -total / (n_eff * k)


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:55s} {dt*1e3:9.3f} ms")
    return out


def main():
    cfg, params, data = make_problem()

    vg_ship = jax.jit(jax.value_and_grad(
        lambda p: nlog_ml(p, data, cfg, complete=True)[0]))
    f_ship, _ = timeit("A shipped fwd+grad", vg_ship, params)

    vg_b = jax.jit(jax.value_and_grad(
        lambda p: nlog_ml_mixed(p, data, cfg, jnp.float64)))
    f_b, g_b = timeit("B blockwise + f64 chol fwd+grad", vg_b, params)

    vg_c = jax.jit(jax.value_and_grad(
        lambda p: nlog_ml_mixed(p, data, cfg, jnp.float32)))
    f_c, g_c = timeit("C blockwise + f32 chol + refine fwd+grad", vg_c, params)

    print(f"f shipped={float(f_ship):.15g}")
    print(f"f B      ={float(f_b):.15g}  rel {abs(float(f_b)-float(f_ship))/abs(float(f_ship)):.3g}")
    print(f"f C      ={float(f_c):.15g}  rel {abs(float(f_c)-float(f_ship))/abs(float(f_ship)):.3g}")
    _, g_a = vg_ship(params)
    for nm in ("P", "gamma", "ln_alpha", "b", "v", "ln_tau"):
        ga = getattr(g_a, nm).ravel()
        gb = getattr(g_b, nm).ravel()
        gc = getattr(g_c, nm).ravel()
        na = float(jnp.linalg.norm(ga)) or 1.0
        print(f"grad {nm:9s} relB {float(jnp.linalg.norm(gb - ga))/na:.3g}"
              f"  relC {float(jnp.linalg.norm(gc - ga))/na:.3g}")


if __name__ == "__main__":
    main()
