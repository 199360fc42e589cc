"""Mean-field ADVI over GPz hyperparameters (the "VI" half of the
beyond-MAP posterior story, BASELINE.json).

q(theta) = N(mu, diag(exp(2 rho))); the ELBO is maximized with the
reparameterization gradient and optax Adam, reusing the same jitted log
posterior as HMC. Returns the variational parameters and a sampler.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax


@partial(jax.jit, static_argnames=("logp_fn", "num_steps", "num_mc", "lr"))
def advi_fit(
    logp_fn: Callable,
    x0: jax.Array,
    key: jax.Array,
    *,
    num_steps: int = 1000,
    num_mc: int = 8,
    lr: float = 1e-2,
    init_log_scale: float = -3.0,
):
    """Fit a mean-field Gaussian to exp(logp). Returns (mu, log_scale, elbos)."""
    p = x0.shape[0]
    params = {
        "mu": x0,
        "rho": jnp.full((p,), init_log_scale, x0.dtype),
    }
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def neg_elbo(params, key):
        eps = jax.random.normal(key, (num_mc, p), x0.dtype)
        scale = jnp.exp(params["rho"])
        xs = params["mu"][None, :] + eps * scale[None, :]
        logps = jax.vmap(logp_fn)(xs)
        # Gaussian entropy: sum(rho) + const
        entropy = jnp.sum(params["rho"])
        return -(jnp.mean(logps) + entropy)

    def step(carry, key):
        params, opt_state = carry
        loss, g = jax.value_and_grad(neg_elbo)(params, key)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), -loss

    keys = jax.random.split(key, num_steps)
    (params, _), elbos = jax.lax.scan(step, (params, opt_state), keys)
    return params["mu"], params["rho"], elbos


def sample_q(mu, rho, key, num_samples: int) -> jax.Array:
    """Draw from the fitted mean-field posterior."""
    eps = jax.random.normal(key, (num_samples, mu.shape[0]), mu.dtype)
    return mu[None, :] + eps * jnp.exp(rho)[None, :]
