"""Hamiltonian Monte Carlo over GPz hyperparameters — true posteriors beyond
the reference's MAP point estimates (BASELINE.json north star; the reference
has no posterior inference at all).

Design:
  * the target is the exact log marginal likelihood (the same jitted
    `nlog_ml` the MAP path uses, un-normalized back to log p(y | theta))
  * warmup adapts the step size by Nesterov dual averaging toward a target
    acceptance rate and a diagonal mass matrix by Welford variance estimation
    (two-window scheme)
  * chains are vmapped; placing the chain axis on the mesh's `restart` axis
    shards independent chains across devices/hosts (SURVEY §2.3: restart/chain
    parallelism), while each chain's likelihood can itself be data-sharded
  * everything is lax control flow — one jit, no host round trips per step
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


def gpz_log_posterior(
    nlml_fn,
    n_eff: float,
    k: int,
    prior_mean: Optional[jax.Array] = None,
    prior_scale: Optional[float] = None,
) -> Callable:
    """Turn the normalized nlogML (mean per sample-output) back into the
    un-normalized log posterior log p(y | theta) + log p(theta).

    A weak Gaussian hyperprior (prior_mean, prior_scale) is recommended: the
    marginal likelihood is flat in some hyperparameter directions (e.g.
    ln_tau as v -> 0), so the flat-prior posterior is improper and chains
    drift. Centering the hyperprior on the MAP with a generous scale keeps
    the posterior proper without materially moving its bulk.
    """

    def logp(x):
        out = -nlml_fn(x) * (n_eff * k)
        if prior_scale is not None:
            mean = 0.0 if prior_mean is None else prior_mean
            out = out - 0.5 * jnp.sum((x - mean) ** 2) / prior_scale**2
        return out

    return logp


class _DAState(NamedTuple):
    log_eps: jax.Array
    log_eps_avg: jax.Array
    h_avg: jax.Array
    mu: jax.Array
    count: jax.Array


def _da_init(eps0):
    return _DAState(
        log_eps=jnp.log(eps0),
        log_eps_avg=jnp.log(eps0),
        h_avg=jnp.zeros_like(eps0),
        mu=jnp.log(10.0 * eps0),
        count=jnp.zeros_like(eps0),
    )


def _da_update(s: _DAState, accept_prob, target):
    # Nesterov dual averaging (Hoffman & Gelman 2014, eqs. 6-7)
    t0, gamma, kappa = 10.0, 0.05, 0.75
    count = s.count + 1.0
    eta_h = 1.0 / (count + t0)
    h_avg = (1.0 - eta_h) * s.h_avg + eta_h * (target - accept_prob)
    log_eps = s.mu - jnp.sqrt(count) / gamma * h_avg
    eta = count**-kappa
    log_eps_avg = eta * log_eps + (1.0 - eta) * s.log_eps_avg
    return _DAState(log_eps, log_eps_avg, h_avg, s.mu, count)


def _pool_scalar(a, axis_name):
    """Mean of a per-chain statistic over ALL chains: local chain axis +
    (under shard_map) a pmean collective over the sharded chain axis. This is
    the psum boundary of collective warmup adaptation (BASELINE.json north
    star: 'collective step-size adaptation via psum of acceptance stats')."""
    out = jnp.mean(a, axis=0)
    if axis_name is not None:
        out = lax.pmean(out, axis_name)
    return out


def collective_mcmc(step_one, logp_fn, x_init, key, *, num_warmup,
                    num_samples, target_accept, eps0, axis_name=None):
    """Chains-coupled MCMC: one SHARED dual-averaging step size and one
    SHARED diagonal mass matrix, adapted from acceptance/variance statistics
    pooled across every chain (cross-device via `axis_name` collectives).

    step_one(key, x, logp, eps, inv_mass) -> (x, logp, accept_stat, aux)
    where aux is a (possibly empty) tuple of per-step scalars.

    Returns (samples (C, S, p), accept_rate (C,), eps_final (), aux_stats)
    with aux_stats a tuple of (C,)-shaped per-chain means of each aux scalar.
    """
    C, p = x_init.shape
    dtype = x_init.dtype

    def step_v(key, x, logp, eps, inv_mass):
        subs = jax.random.split(key, C)
        return jax.vmap(
            lambda k, xx, ll: step_one(k, xx, ll, eps, inv_mass)
        )(subs, x, logp)

    x = x_init
    logp = jax.vmap(logp_fn)(x)
    da = _da_init(jnp.asarray(eps0, dtype))
    inv_mass = jnp.ones((p,), dtype)
    half = num_warmup // 2

    # --- window 1: shared step size, identity mass; per-chain Welford ---
    def warm1(i, carry):
        key, x, logp, da, mean, m2 = carry
        key, sub = jax.random.split(key)
        eps = jnp.exp(da.log_eps)
        x, logp, ap, _ = step_v(sub, x, logp, eps, inv_mass)
        da = _da_update(da, _pool_scalar(ap, axis_name), target_accept)
        cnt = i + 1.0
        d0 = x - mean
        mean = mean + d0 / cnt
        m2 = m2 + d0 * (x - mean)
        return key, x, logp, da, mean, m2

    key, x, logp, da, mean, m2 = lax.fori_loop(
        0, half, warm1,
        (key, x, logp, da, jnp.zeros_like(x), jnp.zeros_like(x)),
    )
    # pooled variance across chains AND iterations (law of total variance)
    var_within = _pool_scalar(m2 / jnp.maximum(half - 1.0, 1.0), axis_name)
    mean_all = _pool_scalar(mean, axis_name)
    var_between = _pool_scalar((mean - mean_all[None, :]) ** 2, axis_name)
    var = var_within + var_between
    w = half / (half + 5.0)
    inv_mass2 = jnp.maximum(w * var + (1 - w) * 1e-3, 1e-10)

    # --- window 2: re-adapt the shared step size under the shared metric ---
    da2 = _da_init(jnp.exp(da.log_eps_avg))

    def warm2(i, carry):
        key, x, logp, da = carry
        key, sub = jax.random.split(key)
        eps = jnp.exp(da.log_eps)
        x, logp, ap, _ = step_v(sub, x, logp, eps, inv_mass2)
        da = _da_update(da, _pool_scalar(ap, axis_name), target_accept)
        return key, x, logp, da

    key, x, logp, da2 = lax.fori_loop(
        0, num_warmup - half, warm2, (key, x, logp, da2)
    )
    eps_final = jnp.exp(da2.log_eps_avg)

    # --- sampling ---
    def draw(carry, _):
        key, x, logp = carry
        key, sub = jax.random.split(key)
        x, logp, ap, aux = step_v(sub, x, logp, eps_final, inv_mass2)
        return (key, x, logp), (x, ap, aux)

    (_, _, _), (samples, aps, auxs) = lax.scan(
        draw, (key, x, logp), None, length=num_samples
    )
    samples = jnp.swapaxes(samples, 0, 1)            # (C, S, p)
    accept = jnp.mean(aps, axis=0)                   # (C,)
    aux_stats = jax.tree.map(lambda a: jnp.mean(a, axis=0), auxs)
    return samples, accept, eps_final, aux_stats


def _leapfrog(grad_fn, x, p, eps, inv_mass, n_steps):
    def body(_, carry):
        x, p = carry
        p = p + 0.5 * eps * grad_fn(x)   # grad_fn = grad(log p)
        x = x + eps * inv_mass * p
        p = p + 0.5 * eps * grad_fn(x)
        return x, p

    return lax.fori_loop(0, n_steps, body, (x, p))


def _hmc_step(logp_fn, grad_fn, key, x, logp, eps, inv_mass, n_steps):
    k1, k2, k3 = jax.random.split(key, 3)
    p0 = jax.random.normal(k1, x.shape, x.dtype) / jnp.sqrt(inv_mass)
    # jittered trajectory length (uniform in [1, n_steps]) breaks the
    # periodicity that fixed-length HMC suffers on near-Gaussian targets
    steps = jax.random.randint(k3, (), 1, n_steps + 1)
    x_new, p_new = _leapfrog(grad_fn, x, p0, eps, inv_mass, steps)
    logp_new = logp_fn(x_new)
    ke0 = 0.5 * jnp.sum(p0 * p0 * inv_mass)
    ke1 = 0.5 * jnp.sum(p_new * p_new * inv_mass)
    log_ratio = (logp_new - ke1) - (logp - ke0)
    log_ratio = jnp.where(jnp.isfinite(log_ratio), log_ratio, -jnp.inf)
    accept_prob = jnp.minimum(1.0, jnp.exp(log_ratio))
    accept = jax.random.uniform(k2) < accept_prob
    x = jnp.where(accept, x_new, x)
    logp = jnp.where(accept, logp_new, logp)
    return x, logp, accept_prob


@partial(
    jax.jit,
    static_argnames=(
        "logp_fn", "num_warmup", "num_samples", "num_chains", "num_leapfrog",
        "collective_adapt", "axis_name",
    ),
)
def hmc_sample(
    logp_fn: Callable,
    x0: jax.Array,
    key: jax.Array,
    *,
    num_warmup: int = 300,
    num_samples: int = 300,
    num_chains: int = 4,
    num_leapfrog: int = 16,
    target_accept: float = 0.8,
    init_jitter: float = 0.01,
    eps0: float = 0.01,
    collective_adapt: bool = False,
    axis_name=None,
):
    """Run `num_chains` HMC chains from jittered copies of x0.

    Returns (samples (chains, num_samples, p), info dict). Place the leading
    chain axis on the mesh `restart` axis (jax.device_put with a NamedSharding
    before/after, or just let jit shard the vmap) to parallelize chains.

    With `collective_adapt=True` all chains co-adapt ONE step size and ONE
    diagonal mass matrix from acceptance/variance statistics pooled across
    the chains; under shard_map with chains sharded on a mesh axis, pass that
    axis as `axis_name` so the pooling runs as a cross-device pmean.
    """
    p = x0.shape[0]
    grad_fn = jax.grad(logp_fn)

    keys = jax.random.split(key, num_chains + 1)
    chain_keys = keys[:-1]
    x_init = x0[None, :] + init_jitter * jax.random.normal(
        keys[-1], (num_chains, p), x0.dtype
    )

    if collective_adapt:
        def step_one(k, x, logp, eps, inv_mass):
            x, logp, ap = _hmc_step(
                logp_fn, grad_fn, k, x, logp, eps, inv_mass, num_leapfrog
            )
            return x, logp, ap, ()

        samples, accept, eps_final, _ = collective_mcmc(
            step_one, logp_fn, x_init, keys[-1],
            num_warmup=num_warmup, num_samples=num_samples,
            target_accept=target_accept, eps0=eps0, axis_name=axis_name,
        )
        return samples, {"accept_rate": accept, "step_size": eps_final}

    half = num_warmup // 2

    def one_chain(ckey, x):
        logp = logp_fn(x)
        da = _da_init(jnp.asarray(eps0, x.dtype))
        inv_mass = jnp.ones_like(x)

        # --- window 1: step-size adaptation, identity mass; Welford stats ---
        def warm1(i, carry):
            key, x, logp, da, mean, m2 = carry
            key, sub = jax.random.split(key)
            eps = jnp.exp(da.log_eps)
            x, logp, ap = _hmc_step(
                logp_fn, grad_fn, sub, x, logp, eps, inv_mass, num_leapfrog
            )
            da = _da_update(da, ap, target_accept)
            cnt = i + 1.0
            d0 = x - mean
            mean = mean + d0 / cnt
            m2 = m2 + d0 * (x - mean)
            return key, x, logp, da, mean, m2

        key, x, logp, da, mean, m2 = lax.fori_loop(
            0, half, warm1,
            (ckey, x, logp, da, jnp.zeros_like(x), jnp.zeros_like(x)),
        )
        var = m2 / jnp.maximum(half - 1.0, 1.0)
        # regularized diagonal mass (Stan's shrinkage toward unit)
        w = half / (half + 5.0)
        inv_mass2 = w * var + (1 - w) * 1e-3
        inv_mass2 = jnp.maximum(inv_mass2, 1e-10)

        # --- window 2: re-adapt step size under the new metric ---
        da2 = _da_init(jnp.exp(da.log_eps_avg))

        def warm2(i, carry):
            key, x, logp, da = carry
            key, sub = jax.random.split(key)
            eps = jnp.exp(da.log_eps)
            x, logp, ap = _hmc_step(
                logp_fn, grad_fn, sub, x, logp, eps, inv_mass2, num_leapfrog
            )
            da = _da_update(da, ap, target_accept)
            return key, x, logp, da

        key, x, logp, da2 = lax.fori_loop(
            0, num_warmup - half, warm2, (key, x, logp, da2)
        )
        eps_final = jnp.exp(da2.log_eps_avg)

        # --- sampling ---
        def draw(carry, _):
            key, x, logp = carry
            key, sub = jax.random.split(key)
            x, logp, ap = _hmc_step(
                logp_fn, grad_fn, sub, x, logp, eps_final, inv_mass2,
                num_leapfrog,
            )
            return (key, x, logp), (x, ap)

        (_, _, _), (samples, aps) = lax.scan(
            draw, (key, x, logp), None, length=num_samples
        )
        return samples, jnp.mean(aps), eps_final

    samples, accept_rate, eps_final = jax.vmap(one_chain)(chain_keys, x_init)
    return samples, {"accept_rate": accept_rate, "step_size": eps_final}


def split_rhat(samples: jax.Array) -> jax.Array:
    """Split-R-hat convergence diagnostic per dimension.

    samples: (chains, draws, p) -> (p,). Values near 1 indicate convergence.
    """
    c, n, p = samples.shape
    half = n // 2
    halves = jnp.concatenate(
        [samples[:, :half, :], samples[:, half : 2 * half, :]], axis=0
    )  # (2c, half, p)
    m = halves.shape[0]
    chain_means = jnp.mean(halves, axis=1)            # (2c, p)
    chain_vars = jnp.var(halves, axis=1, ddof=1)      # (2c, p)
    W = jnp.mean(chain_vars, axis=0)
    B = half * jnp.var(chain_means, axis=0, ddof=1)
    var_post = (half - 1) / half * W + B / half
    return jnp.sqrt(var_post / W)
