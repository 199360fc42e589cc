"""Mixture-prior EM over basis responsibilities (ref GPz/getPrior.m).

The reference re-runs the full getPHI design-matrix build inside each of up to
100 EM iterations (getPrior.m:7-20). The densities do not depend on the prior,
so here lnN is computed once and the fixed-point runs on the (n, m) matrix —
identical result, ~100x less work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from gpz_tpu.config import ModelConfig
from gpz_tpu.dataset import Dataset
from gpz_tpu.params import GPzParams
from gpz_tpu.phi import log_phi


def get_prior(
    params: GPzParams,
    data: Dataset,
    cfg: ModelConfig,
    complete: bool = False,
    max_iter: int = 100,
    tol: float = 1e-10,
) -> jax.Array:
    """EM fixed point for mixture weights over the m bases, (m,)."""
    _, ln_n = log_phi(params, cfg, data.X, data.mask, data.psi, complete)
    # log-sum-exp stabilized responsibilities
    N = jnp.exp(ln_n - jnp.max(ln_n, axis=1, keepdims=True))

    prior0 = jnp.full((cfg.m,), 1.0 / cfg.m, dtype=data.X.dtype)

    def cond(carry):
        it, prior, delta = carry
        return (it < max_iter) & (delta >= tol)

    def body(carry):
        it, prior, _ = carry
        w = N * prior[None, :]
        w = w / jnp.sum(w, axis=1, keepdims=True)
        new = jnp.mean(w, axis=0)
        delta = jnp.linalg.norm(prior - new) / jnp.linalg.norm(prior + new)
        return it + 1, new, delta

    _, prior, _ = lax.while_loop(cond, body, (0, prior0, jnp.inf))
    return prior
