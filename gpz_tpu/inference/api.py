"""User-facing posterior inference over a trained GPz model.

Wraps the flat-vector HMC/ADVI machinery with the model's preprocessing:
    samples = sample_posterior(model, X, Y, training=tr, psi=psi)
    preds   = predictive_draws(model, samples, X_test)
giving hyperparameter posteriors (beyond the reference's MAP point estimate)
and posterior-predictive means with between-sample spread.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from gpz_tpu import datautils
from gpz_tpu import model as model_mod
from gpz_tpu.objective import nlog_ml, posterior as posterior_solve
from gpz_tpu.inference.mcmc import hmc_sample, gpz_log_posterior, split_rhat


def sample_posterior(
    model,
    X,
    Y,
    *,
    omega=None,
    training=None,
    psi=None,
    num_warmup: int = 300,
    num_samples: int = 300,
    num_chains: int = 4,
    prior_scale: float = 3.0,
    seed: int = 0,
    sampler: str = "hmc",
):
    """HMC or NUTS over hyperparameters, from the trained MAP (model.best).

    Returns (samples (chains, draws, p), info) where info includes
    acceptance rates, step sizes, split-Rhat, and the unravel function to map
    flat draws back to GPzParams. `prior_scale` sets the weak Gaussian
    hyperprior around the MAP that keeps the posterior proper (see
    gpz_log_posterior).
    """
    cfg = model.cfg
    Xa = np.asarray(X, dtype=np.float64)
    Ya = np.asarray(Y, dtype=np.float64)
    if Ya.ndim == 1:
        Ya = Ya[:, None]
    n = Xa.shape[0]
    if training is None:
        training = np.ones(n, dtype=bool)
    if omega is None:
        omega = np.ones(n)
    Xn = (Xa - model.muX[None, :]) / model.sdX[None, :]
    Yc = Ya - model.muY[None, :]
    psi_c = datautils.fix_psi(psi, n, model.sdX, cfg.full_cov)
    dt = jnp.dtype(cfg.dtype)
    data = model_mod._make_dataset(Xn, Yc, psi_c, omega, training, dt)
    complete = bool(np.all(data.mask))

    flat_map, unravel = ravel_pytree(model.best.params)

    def nlml_flat(x):
        return nlog_ml(unravel(x), data, cfg, complete=complete)[0]

    logp = gpz_log_posterior(
        nlml_flat,
        n_eff=float(int(np.sum(training))),
        k=cfg.k,
        prior_mean=flat_map,
        prior_scale=prior_scale,
    )
    if sampler == "nuts":
        from gpz_tpu.inference.nuts import nuts_sample

        samples, info = nuts_sample(
            logp, flat_map, jax.random.PRNGKey(seed),
            num_warmup=num_warmup, num_samples=num_samples,
            num_chains=num_chains,
        )
    elif sampler == "hmc":
        samples, info = hmc_sample(
            logp, flat_map, jax.random.PRNGKey(seed),
            num_warmup=num_warmup, num_samples=num_samples,
            num_chains=num_chains,
        )
    else:
        raise ValueError(f"sampler must be 'hmc' or 'nuts', got {sampler!r}")
    info = dict(info)
    info["rhat"] = split_rhat(samples)
    info["unravel"] = unravel
    info["data"] = data
    info["complete"] = complete
    return samples, info


def predictive_draws(
    model,
    samples,
    info,
    X_new,
    *,
    psi_new=None,
    thin: int = 10,
):
    """Posterior-predictive means over thinned hyperparameter draws.

    Returns (mus (S, n_new, k), mean_mu, std_mu): the epistemic spread of the
    predictive mean induced by hyperparameter uncertainty — information the
    MAP-only reference cannot provide.
    """
    cfg = model.cfg
    unravel = info["unravel"]
    data = info["data"]
    complete = info["complete"]
    flat = np.asarray(samples).reshape(-1, samples.shape[-1])[::thin]

    Xn = (np.asarray(X_new, dtype=np.float64) - model.muX[None, :]) / (
        model.sdX[None, :]
    )
    n_new = Xn.shape[0]
    psi_c = datautils.fix_psi(psi_new, n_new, model.sdX, cfg.full_cov)
    dt = jnp.dtype(cfg.dtype)
    Xj = jnp.asarray(Xn, dt)
    mask = jnp.ones(Xn.shape, bool)
    psij = None if psi_c is None else jnp.asarray(psi_c, dt)

    from gpz_tpu.phi import design_matrix

    @jax.jit
    def one(flat_theta):
        params = unravel(flat_theta)
        post = posterior_solve(params, data, cfg, complete=complete)
        PHI, _, _ = design_matrix(params, cfg, Xj, mask, psij, complete=True)
        return PHI @ post.w

    mus = jnp.stack([one(jnp.asarray(f)) for f in flat])
    mus = np.asarray(mus) + model.muY[None, None, :]
    return mus, mus.mean(axis=0), mus.std(axis=0)
