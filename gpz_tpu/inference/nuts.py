"""No-U-Turn Sampler (NUTS), jit-compiled, iterative formulation.

Implements multinomial NUTS (Hoffman & Gelman 2014, with multinomial
progressive sampling and biased trajectory merging a la Stan):

  * per-depth subtree construction is a lax.fori_loop over 2^depth leapfrog
    leaves — the program size grows linearly in max_depth, not 2^max_depth
  * within-subtree U-turn checks use the balanced-binary-tree checkpoint
    scheme: at leaf i, levels j with i % 2^j == 0 store (x, p) checkpoints;
    levels with (i+1) % 2^j == 0 check the original position-difference
    criterion (x_end - x_start) . M^-1 p < 0 against their checkpoint
  * progressive multinomial sampling inside subtrees, biased merge across
    doublings, divergence guard at dH > 1000
  * warmup reuses the dual-averaging + diagonal mass adaptation of
    gpz_tpu.inference.mcmc

Chains are vmapped and shardable over the mesh `restart` axis exactly like
HMC. Validated against exact Gaussian moments and the HMC sampler in
tests/test_nuts.py.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from gpz_tpu.inference.mcmc import _da_init, _da_update

_DIVERGENCE = 1000.0


class _SubtreeState(NamedTuple):
    key: jax.Array
    x: jax.Array           # current endpoint position
    p: jax.Array           # current endpoint momentum
    grad: jax.Array        # grad log p at endpoint
    x_prop: jax.Array      # subtree proposal
    log_sum_w: jax.Array   # log sum of leaf weights in subtree
    sum_accept: jax.Array  # sum of min(1, exp(-dH)) for DA
    n_visited: jax.Array   # leaves actually evaluated (for the DA average)
    ckpt_x: jax.Array      # (max_depth + 1, dim)
    ckpt_p: jax.Array
    turning: jax.Array
    diverged: jax.Array


def _leapfrog(grad_fn, x, p, grad, eps, inv_mass):
    p_half = p + 0.5 * eps * grad
    x_new = x + eps * inv_mass * p_half
    grad_new = grad_fn(x_new)
    p_new = p_half + 0.5 * eps * grad_new
    return x_new, p_new, grad_new


def _build_subtree(logp_fn, grad_fn, state: _SubtreeState, depth, eps,
                   inv_mass, h0, max_depth):
    """Extend the trajectory by 2^depth leaves from the current endpoint.

    eps carries the direction sign. Returns the updated state; on turning or
    divergence the proposal/log_sum_w are invalid and must be discarded by
    the caller.
    """
    n_leaf = 2**depth

    def body(i, s: _SubtreeState):
        x, p, grad = _leapfrog(grad_fn, s.x, s.p, s.grad, eps, inv_mass)
        logp = logp_fn(x)
        h = -logp + 0.5 * jnp.sum(p * p * inv_mass)
        dh = h - h0
        dh = jnp.where(jnp.isfinite(dh), dh, jnp.inf)
        diverged = s.diverged | (dh > _DIVERGENCE)
        log_w = -dh

        # progressive multinomial sampling within the subtree
        log_sum_new = jnp.logaddexp(s.log_sum_w, log_w)
        key, sub = jax.random.split(s.key)
        take = jnp.log(jax.random.uniform(sub)) < (log_w - log_sum_new)
        x_prop = jnp.where(take, x, s.x_prop)

        sum_accept = s.sum_accept + jnp.minimum(1.0, jnp.exp(-dh))
        n_visited = s.n_visited + 1

        # checkpoint store: levels j with i % 2^j == 0 record (x, p)
        ii = i
        store = jnp.asarray(
            [ii % (2**j) == 0 for j in range(max_depth + 1)]
        )
        ckpt_x = jnp.where(store[:, None], x[None, :], s.ckpt_x)
        ckpt_p = jnp.where(store[:, None], p[None, :], s.ckpt_p)

        # U-turn checks: levels j with (i+1) % 2^j == 0 and 2^j <= leaves
        # built so far compare against their checkpoint
        turning = s.turning
        v = inv_mass * p
        for j in range(1, max_depth + 1):
            do = ((ii + 1) % (2**j) == 0) & (2**j <= n_leaf)
            dx = x - ckpt_x[j]
            v0 = inv_mass * ckpt_p[j]
            turn_j = (jnp.vdot(dx, v0) < 0) | (jnp.vdot(dx, v) < 0)
            turning = turning | (do & turn_j)

        return _SubtreeState(
            key=key, x=x, p=p, grad=grad, x_prop=x_prop,
            log_sum_w=log_sum_new, sum_accept=sum_accept,
            n_visited=n_visited,
            ckpt_x=ckpt_x, ckpt_p=ckpt_p,
            turning=turning, diverged=diverged,
        )

    def guarded(i, s):
        # explicit select, not lax.cond: under the chain vmap cond lowers to
        # a both-branches select anyway, and the select keeps the
        # varying-manual-axes types consistent when the chains are sharded
        # over a mesh axis under shard_map (collective adaptation)
        s2 = body(i, s)
        stop = s.turning | s.diverged
        return jax.tree.map(lambda a, b: jnp.where(stop, a, b), s, s2)

    return lax.fori_loop(0, n_leaf, guarded, state)


def _nuts_step(logp_fn, grad_fn, key, x0, logp0, eps, inv_mass, max_depth,
               axis_name=None):
    """One NUTS transition. Returns (x_new, logp_new, accept_stat, depth).

    `axis_name`: set when the chains are sharded over a mesh axis under
    shard_map (collective adaptation). The freshly created constants of the
    per-subtree while-carry (zeros/-inf/False) are then pcast to 'varying'
    over that axis — shard_map's typed carries reject a loop whose input
    carry is axis-invariant but whose output depends on varying data."""
    dim = x0.shape[0]
    kp, key = jax.random.split(key)
    p0 = jax.random.normal(kp, (dim,), x0.dtype) / jnp.sqrt(inv_mass)
    h0 = -logp0 + 0.5 * jnp.sum(p0 * p0 * inv_mass)
    grad0 = grad_fn(x0)

    class Carry(NamedTuple):
        key: jax.Array
        x_left: jax.Array
        p_left: jax.Array
        grad_left: jax.Array
        x_right: jax.Array
        p_right: jax.Array
        grad_right: jax.Array
        x_prop: jax.Array
        log_sum_w: jax.Array
        sum_accept: jax.Array
        n_leaves: jax.Array
        depth: jax.Array
        done: jax.Array
        diverged: jax.Array

    carry = Carry(
        key=key,
        x_left=x0, p_left=p0, grad_left=grad0,
        x_right=x0, p_right=p0, grad_right=grad0,
        x_prop=x0,
        log_sum_w=jnp.zeros((), x0.dtype),
        sum_accept=jnp.zeros((), x0.dtype),
        n_leaves=jnp.zeros((), jnp.int32),
        depth=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        diverged=jnp.zeros((), bool),
    )

    zeros_ckpt = jnp.zeros((max_depth + 1, dim), x0.dtype)

    def doubling(depth, c: Carry):
        def extend(c: Carry):
            key, kd, ks = jax.random.split(c.key, 3)
            go_right = jax.random.bernoulli(kd)
            eps_d = jnp.where(go_right, eps, -eps)
            x_e = jnp.where(go_right, c.x_right, c.x_left)
            p_e = jnp.where(go_right, c.p_right, c.p_left)
            g_e = jnp.where(go_right, c.grad_right, c.grad_left)

            sub = _SubtreeState(
                key=ks, x=x_e, p=p_e, grad=g_e,
                x_prop=x_e,                       # overwritten by first leaf
                log_sum_w=jnp.asarray(-jnp.inf, x0.dtype),
                sum_accept=jnp.zeros((), x0.dtype),
                n_visited=jnp.zeros((), jnp.int32),
                ckpt_x=zeros_ckpt, ckpt_p=zeros_ckpt,
                turning=jnp.zeros((), bool),
                diverged=jnp.zeros((), bool),
            )
            if axis_name is not None:
                # fresh constants -> varying over the chain-shard axis (see
                # _nuts_step docstring); leaves already varying are left alone
                # (pcast rejects varying->varying)
                def _to_varying(a):
                    vma = getattr(jax.typeof(a), "vma", frozenset())
                    if axis_name in vma:
                        return a
                    return jax.lax.pcast(a, axis_name, to="varying")

                sub = jax.tree.map(_to_varying, sub)
            sub = _build_subtree(
                logp_fn, grad_fn, sub, depth, eps_d, inv_mass, h0, max_depth
            )

            bad = sub.turning | sub.diverged
            # biased progressive merge (Stan): accept subtree proposal with
            # prob min(1, w_sub / w_tree)
            key, ka = jax.random.split(key)
            take = (
                jnp.log(jax.random.uniform(ka))
                < (sub.log_sum_w - c.log_sum_w)
            ) & ~bad
            x_prop = jnp.where(take, sub.x_prop, c.x_prop)
            log_sum_w = jnp.where(
                bad, c.log_sum_w, jnp.logaddexp(c.log_sum_w, sub.log_sum_w)
            )

            x_left = jnp.where(go_right, c.x_left, sub.x)
            p_left = jnp.where(go_right, c.p_left, sub.p)
            g_left = jnp.where(go_right, c.grad_left, sub.grad)
            x_right = jnp.where(go_right, sub.x, c.x_right)
            p_right = jnp.where(go_right, sub.p, c.p_right)
            g_right = jnp.where(go_right, sub.grad, c.grad_right)

            # top-level U-turn across the merged trajectory
            dx = x_right - x_left
            turning_top = (
                jnp.vdot(dx, inv_mass * p_left) < 0
            ) | (jnp.vdot(dx, inv_mass * p_right) < 0)

            done = bad | turning_top
            return Carry(
                key=key,
                x_left=x_left, p_left=p_left, grad_left=g_left,
                x_right=x_right, p_right=p_right, grad_right=g_right,
                x_prop=x_prop,
                log_sum_w=log_sum_w,
                sum_accept=c.sum_accept + sub.sum_accept,
                n_leaves=c.n_leaves + sub.n_visited,
                depth=jnp.asarray(depth + 1, jnp.int32),
                done=done,
                diverged=c.diverged | sub.diverged,
            )

        # select instead of lax.cond — see guarded() in _build_subtree
        c2 = extend(c)
        return jax.tree.map(lambda a, b: jnp.where(c.done, a, b), c, c2)

    for depth in range(max_depth):
        carry = doubling(depth, carry)

    x_new = carry.x_prop
    logp_new = logp_fn(x_new)
    accept_stat = carry.sum_accept / jnp.maximum(
        carry.n_leaves.astype(x0.dtype), 1.0
    )
    return x_new, logp_new, accept_stat, carry.depth, carry.diverged


@partial(
    jax.jit,
    static_argnames=(
        "logp_fn", "num_warmup", "num_samples", "num_chains", "max_depth",
        "collective_adapt", "axis_name",
    ),
)
def nuts_sample(
    logp_fn: Callable,
    x0: jax.Array,
    key: jax.Array,
    *,
    num_warmup: int = 300,
    num_samples: int = 300,
    num_chains: int = 4,
    max_depth: int = 8,
    target_accept: float = 0.8,
    init_jitter: float = 0.01,
    eps0: float = 0.01,
    collective_adapt: bool = False,
    axis_name=None,
):
    """Run `num_chains` NUTS chains; returns (samples (C, S, p), info).

    `collective_adapt` / `axis_name`: co-adapt ONE shared step size and mass
    matrix from chain-pooled statistics (cross-device pmean over `axis_name`
    when chains are sharded under shard_map) — see mcmc.collective_mcmc.
    """
    p_dim = x0.shape[0]
    grad_fn = jax.grad(logp_fn)

    keys = jax.random.split(key, num_chains + 1)
    x_init = x0[None, :] + init_jitter * jax.random.normal(
        keys[-1], (num_chains, p_dim), x0.dtype
    )
    half = num_warmup // 2

    if collective_adapt:
        from gpz_tpu.inference.mcmc import collective_mcmc

        def step_one(k, x, logp, eps, inv_mass):
            x, logp, acc, depth, div = _nuts_step(
                logp_fn, grad_fn, k, x, logp, eps, inv_mass, max_depth,
                axis_name=axis_name,
            )
            return x, logp, acc, (depth.astype(x.dtype), div)

        samples, accept, eps_final, (mean_depth, divs) = collective_mcmc(
            step_one, logp_fn, x_init, keys[-1],
            num_warmup=num_warmup, num_samples=num_samples,
            target_accept=target_accept, eps0=eps0, axis_name=axis_name,
        )
        return samples, {
            "accept_rate": accept,
            "step_size": eps_final,
            "mean_tree_depth": mean_depth,
            "divergences": jnp.sum(divs, axis=-1) if divs.ndim else divs,
        }

    def one_chain(ckey, x):
        logp = logp_fn(x)
        da = _da_init(jnp.asarray(eps0, x.dtype))
        inv_mass = jnp.ones_like(x)

        def warm1(i, carry):
            key, x, logp, da, mean, m2 = carry
            key, sub = jax.random.split(key)
            eps = jnp.exp(da.log_eps)
            x, logp, acc, _, _ = _nuts_step(
                logp_fn, grad_fn, sub, x, logp, eps, inv_mass, max_depth
            )
            da = _da_update(da, acc, target_accept)
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
        w = half / (half + 5.0)
        inv_mass2 = jnp.maximum(w * var + (1 - w) * 1e-3, 1e-10)

        da2 = _da_init(jnp.exp(da.log_eps_avg))

        def warm2(i, carry):
            key, x, logp, da = carry
            key, sub = jax.random.split(key)
            eps = jnp.exp(da.log_eps)
            x, logp, acc, _, _ = _nuts_step(
                logp_fn, grad_fn, sub, x, logp, eps, inv_mass2, max_depth
            )
            da = _da_update(da, acc, target_accept)
            return key, x, logp, da

        key, x, logp, da2 = lax.fori_loop(
            0, num_warmup - half, warm2, (key, x, logp, da2)
        )
        eps_final = jnp.exp(da2.log_eps_avg)

        def draw(carry, _):
            key, x, logp = carry
            key, sub = jax.random.split(key)
            x, logp, acc, depth, div = _nuts_step(
                logp_fn, grad_fn, sub, x, logp, eps_final, inv_mass2,
                max_depth,
            )
            return (key, x, logp), (x, acc, depth, div)

        (_, _, _), (samples, accs, depths, divs) = lax.scan(
            draw, (key, x, logp), None, length=num_samples
        )
        return samples, jnp.mean(accs), eps_final, jnp.mean(
            depths.astype(x.dtype)
        ), jnp.sum(divs)

    samples, acc, eps_f, mean_depth, n_div = jax.vmap(one_chain)(
        keys[:-1], x_init
    )
    return samples, {
        "accept_rate": acc,
        "step_size": eps_f,
        "mean_tree_depth": mean_depth,
        "divergences": n_div,
    }
