"""Round-2 diagnostic: where does the f64 solve path spend its 245 ms?

Times each candidate piece of the objective on the real chip, both dtypes.
Run:  python benchmarks/profile_f64.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_problem
from gpz_tpu.objective import nlog_ml, _gram_terms
from gpz_tpu.phi import design_matrix
from gpz_tpu.linalg import safe_cholesky, chol_logdet, chol_solve


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:55s} {dt*1e3:9.3f} ms")
    return dt


def main():
    cfg, params, data = make_problem()
    n, m, k = data.n, cfg.m, cfg.k

    # full objective fwd and fwd+grad
    f_fwd = jax.jit(lambda p: nlog_ml(p, data, cfg, complete=True)[0])
    f_vg = jax.jit(
        lambda p: jax.value_and_grad(
            lambda q: nlog_ml(q, data, cfg, complete=True), has_aux=True
        )(p)
    )
    timeit("nlog_ml fwd (shipped cfg)", f_fwd, params)
    timeit("nlog_ml fwd+grad (shipped cfg)", f_vg, params)

    # design matrix alone
    dm = jax.jit(lambda p: design_matrix(p, cfg, data.X, data.mask, data.psi, True))
    timeit("design_matrix fwd", dm, params)
    dm_g = jax.jit(jax.grad(lambda p: jnp.sum(
        design_matrix(p, cfg, data.X, data.mask, data.psi, True)[0])))
    timeit("design_matrix fwd+grad(sum)", dm_g, params)

    # Gram einsum variants
    rng = np.random.default_rng(0)
    PHI = jnp.asarray(rng.standard_normal((n, m)).astype(np.float32))
    ob = jnp.asarray(rng.random((n, k)).astype(np.float32))

    e32 = jax.jit(lambda P, o: jnp.einsum("nm,nk,nj->kmj", P, o, P))
    timeit("gram einsum f32->f32", e32, PHI, ob)
    if jax.config.jax_enable_x64:
        e64 = jax.jit(lambda P, o: jnp.einsum(
            "nm,nk,nj->kmj", P, o, P, preferred_element_type=jnp.float64))
        timeit("gram einsum f32->pref_f64", e64, PHI, ob)
        # grad of the f64 einsum wrt PHI
        e64g = jax.jit(jax.grad(lambda P: jnp.sum(jnp.einsum(
            "nm,nk,nj->kmj", P, ob, P, preferred_element_type=jnp.float64))))
        timeit("gram einsum f32->pref_f64 grad", e64g, PHI)

        # blockwise: f32 per-block on MXU, f64 cross-block accumulation
        B = 8192
        nb = -(-n // B)
        npad = nb * B

        def blockwise(P, o):
            Pp = jnp.pad(P, ((0, npad - n), (0, 0))).reshape(nb, B, m)
            op = jnp.pad(o, ((0, npad - n), (0, 0))).reshape(nb, B, k)
            parts = jnp.einsum("bnm,bnk,bnj->bkmj", Pp, op, Pp)
            return jnp.sum(parts.astype(jnp.float64), axis=0)
        bw = jax.jit(blockwise)
        timeit("gram blockwise f32-MXU + f64 accum", bw, PHI, ob)
        bwg = jax.jit(jax.grad(lambda P: jnp.sum(blockwise(P, ob))))
        timeit("gram blockwise grad", bwg, PHI)

        # f64 cholesky + solve at (k, m, m)
        S64 = (blockwise(PHI, ob) + 10.0 * jnp.eye(m, dtype=jnp.float64))
        chol64 = jax.jit(lambda S: safe_cholesky(S))
        timeit("safe_cholesky f64 (k,m,m)", chol64, S64)
        L64 = safe_cholesky(S64)
        rhs = jnp.asarray(rng.standard_normal((k, m, 1)))
        solve64 = jax.jit(lambda L, r: chol_solve(L, r))
        timeit("chol_solve f64", solve64, L64, rhs)
        plain64 = jax.jit(jnp.linalg.cholesky)
        timeit("plain cholesky f64", plain64, S64)

        # scalar f64 reductions over n
        red = jax.jit(lambda x: jnp.sum(x * x, axis=0, dtype=jnp.float64))
        timeit("f64-accum reduction over (n,k)", red, ob)

        # f32 cholesky for comparison
        S32 = S64.astype(jnp.float32)
        chol32 = jax.jit(lambda S: safe_cholesky(S))
        timeit("safe_cholesky f32 (k,m,m)", chol32, S32)

        # f64 elementwise exp on (m,k)
        ee = jax.jit(lambda x: jnp.exp(x.astype(jnp.float64)))
        timeit("f64 exp (m,k)", ee, jnp.zeros((m, k), jnp.float32))


if __name__ == "__main__":
    main()
