"""Multi-restart ensemble training.

The reference's random center initialization (ref GPz/init.m:58) makes
multi-restart training embarrassingly parallel (SURVEY §2.3: the GPz analogue
of ensemble/expert parallelism). Here all restarts run as one vmapped
jit-compiled L-BFGS — a single XLA program whose restart lane can be sharded
over the mesh's `restart` axis, so R restarts on R devices cost one restart's
wall clock.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
from jax.sharding import NamedSharding, PartitionSpec as P

from gpz_tpu.config import TrainConfig
from gpz_tpu import model as model_mod
from gpz_tpu import datautils
from gpz_tpu.objective import nlog_ml, holdout_metrics, posterior
from gpz_tpu.optim import minimize
from gpz_tpu.prior import get_prior
from gpz_tpu.parallel.mesh import RESTART_AXIS


def fit_ensemble(
    X,
    Y,
    method: str = "VL",
    m: int = 100,
    n_restarts: int = 4,
    *,
    heteroscedastic: bool = True,
    normalize: bool = True,
    omega=None,
    training=None,
    validation=None,
    psi=None,
    max_iter: int = 200,
    max_attempts: Optional[int] = None,
    seed: int = 0,
    dtype: str = "float32",
    mesh=None,
):
    """Initialize and train `n_restarts` independent models in one vmapped
    program; returns (best GPzModel, info dict with per-restart scores).

    With `mesh`, the restart axis is sharded over mesh[RESTART_AXIS] (data is
    replicated) — restarts run concurrently on separate devices.
    """
    models = [
        model_mod.init(
            X, Y, method, m,
            heteroscedastic=heteroscedastic, normalize=normalize,
            omega=omega, training=training, psi=psi,
            seed=seed + r, dtype=dtype,
        )
        for r in range(n_restarts)
    ]
    cfg = models[0].cfg

    # shared preprocessing (identical stats across restarts by construction
    # since they come from the data, not the seed)
    base = models[0]
    Xa = np.asarray(X, dtype=np.float64)
    Ya = np.asarray(Y, dtype=np.float64)
    if Ya.ndim == 1:
        Ya = Ya[:, None]
    n = Xa.shape[0]
    if training is None:
        training = np.ones(n, dtype=bool)
    if omega is None:
        omega = np.ones(n)
    Xn = (Xa - base.muX[None, :]) / base.sdX[None, :]
    Yc = Ya - base.muY[None, :]
    psi_c = datautils.fix_psi(psi, n, base.sdX, cfg.full_cov)
    dt = jnp.dtype(cfg.dtype)
    data_tr = model_mod._make_dataset(Xn, Yc, psi_c, omega, training, dt)
    complete_tr = bool(np.all(data_tr.mask))

    has_valid = validation is not None and np.any(validation)
    if has_valid:
        data_va = model_mod._make_dataset(Xn, Yc, psi_c, omega, validation, dt)
        complete_va = bool(np.all(data_va.mask))

    flat0s, unravel = None, None
    stacked = []
    for mod in models:
        f, unravel = ravel_pytree(mod.last.params)
        stacked.append(f)
    flat0s = jnp.stack(stacked)                       # (R, p)

    if mesh is not None:
        flat0s = jax.device_put(
            flat0s, NamedSharding(mesh, P(RESTART_AXIS))
        )

    vg = jax.value_and_grad(
        lambda p: nlog_ml(p, data_tr, cfg, complete=complete_tr),
        has_aux=True,
    )

    def fun(flat):
        (f, aux), g = vg(unravel(flat))
        return f, ravel_pytree(g)[0], aux

    score_fn = None
    if has_valid:
        def score_fn(flat, aux):
            rmse, ll = holdout_metrics(
                unravel(flat), aux.w, data_va, cfg, complete=complete_va
            )
            return ll, {"valid_rmse": rmse, "valid_ll": ll}

    tc = TrainConfig(max_iter=max_iter, max_attempts=max_attempts)

    def one(flat0):
        return minimize(
            fun, flat0,
            history=tc.history, max_iter=tc.max_iter,
            opt_tol=tc.opt_tol, prog_tol=tc.prog_tol,
            c1=tc.c1, c2=tc.c2, max_ls=tc.max_ls,
            score_fn=score_fn, max_attempts=tc.max_attempts,
        )

    res = jax.vmap(one)(flat0s)

    scores = np.asarray(res.best_score)
    best_r = int(np.argmax(scores))
    best_flat = jax.tree.map(lambda x: x[best_r], res).x_best
    last_flat = jax.tree.map(lambda x: x[best_r], res).x

    def resolve(flat, score):
        params = unravel(flat)
        post = jax.jit(posterior, static_argnames=("cfg", "complete"))(
            params, data_tr, cfg, complete=complete_tr
        )
        priors = jax.jit(get_prior, static_argnames=("cfg", "complete"))(
            params, data_tr, cfg, complete=complete_tr
        )
        return model_mod.ParamSet(
            params=params, post=post, priors=priors, score=score
        )

    best_model = model_mod.GPzModel(
        cfg=cfg, muX=base.muX, sdX=base.sdX, muY=base.muY,
        last=resolve(last_flat, -math.inf),
        best=resolve(best_flat, float(scores[best_r])),
        fit_info={
            "restart_scores": scores,
            "best_restart": best_r,
            "iterations": np.asarray(res.iterations),
            "fun_evals": np.asarray(res.fun_evals),
        },
    )
    return best_model, best_model.fit_info
