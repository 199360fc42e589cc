"""Model serialization and restartable training.

The reference's persistence story is "MATLAB save of the model struct"
(SURVEY §5 checkpoint/resume); here it is an explicit versioned .npz with a
JSON header. Because `train` restarts from `model.last` and preserves
`model.best` (ref train.m:8-11), save/load at any point gives restartable
training: load + train continues where it stopped, surviving preemption.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np
import jax.numpy as jnp

from gpz_tpu.config import ModelConfig
from gpz_tpu.params import GPzParams
from gpz_tpu.objective import Posterior

_FORMAT_VERSION = 1


def _pset_arrays(prefix: str, pset) -> dict:
    out = {
        f"{prefix}.P": pset.params.P,
        f"{prefix}.gamma": pset.params.gamma,
        f"{prefix}.ln_alpha": pset.params.ln_alpha,
        f"{prefix}.b": pset.params.b,
        f"{prefix}.w": pset.post.w,
        f"{prefix}.iSigma_w": pset.post.iSigma_w,
        f"{prefix}.logdet": pset.post.logdet,
        f"{prefix}.priors": pset.priors,
    }
    if pset.params.v is not None:
        out[f"{prefix}.v"] = pset.params.v
        out[f"{prefix}.ln_tau"] = pset.params.ln_tau
    return out


def save_model(model, path: str) -> None:
    """Serialize a GPzModel to one .npz file (atomic rename)."""
    header = {
        "format_version": _FORMAT_VERSION,
        "cfg": dataclasses.asdict(model.cfg),
        "best_score": model.best.score,
        "last_score": model.last.score,
    }
    arrays = {
        "muX": model.muX,
        "sdX": model.sdX,
        "muY": model.muY,
        **_pset_arrays("last", model.last),
        **_pset_arrays("best", model.best),
    }
    arrays = {k: np.asarray(v) for k, v in arrays.items()}
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, __header__=json.dumps(header), **arrays)
    os.replace(tmp, path)


def _load_pset(prefix: str, z, dtype, score: float):
    from gpz_tpu.model import ParamSet

    het = f"{prefix}.v" in z
    params = GPzParams(
        P=jnp.asarray(z[f"{prefix}.P"], dtype),
        gamma=jnp.asarray(z[f"{prefix}.gamma"], dtype),
        ln_alpha=jnp.asarray(z[f"{prefix}.ln_alpha"], dtype),
        b=jnp.asarray(z[f"{prefix}.b"], dtype),
        v=jnp.asarray(z[f"{prefix}.v"], dtype) if het else None,
        ln_tau=jnp.asarray(z[f"{prefix}.ln_tau"], dtype) if het else None,
    )
    post = Posterior(
        w=jnp.asarray(z[f"{prefix}.w"], dtype),
        iSigma_w=jnp.asarray(z[f"{prefix}.iSigma_w"], dtype),
        logdet=jnp.asarray(z[f"{prefix}.logdet"], dtype),
    )
    return ParamSet(
        params=params,
        post=post,
        priors=jnp.asarray(z[f"{prefix}.priors"], dtype),
        score=score,
    )


def load_model(path: str):
    """Load a GPzModel saved by save_model."""
    from gpz_tpu.model import GPzModel

    with np.load(path, allow_pickle=False) as z:
        header = json.loads(str(z["__header__"]))
        if header["format_version"] != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported checkpoint version {header['format_version']}"
            )
        cfg = ModelConfig(**header["cfg"])
        dtype = jnp.dtype(cfg.dtype)
        last = _load_pset("last", z, dtype, header["last_score"])
        best = _load_pset("best", z, dtype, header["best_score"])
        return GPzModel(
            cfg=cfg,
            muX=np.asarray(z["muX"]),
            sdX=np.asarray(z["sdX"]),
            muY=np.asarray(z["muY"]),
            last=last,
            best=best,
        )


def train_with_checkpoints(
    model,
    X,
    Y,
    *,
    checkpoint_path: str,
    segment_iters: int = 50,
    max_iter: int = 200,
    resume: bool = True,
    **train_kwargs,
):
    """Preemption-safe training: optimize in segments, checkpointing after
    each (the elastic-recovery subsystem the reference lacks, SURVEY §5).

    If `resume` and a checkpoint exists, continues from it. The L-BFGS
    curvature history restarts at each segment boundary (the carried model
    state is theta + best-theta, matching the reference's repeated-train
    semantics, train.m:8-11).
    """
    from gpz_tpu import model as model_mod

    if resume and os.path.exists(checkpoint_path):
        model = load_model(checkpoint_path)

    done = 0
    while done < max_iter:
        seg = min(segment_iters, max_iter - done)
        model = model_mod.train(model, X, Y, max_iter=seg, **train_kwargs)
        done += model.fit_info["iterations"]
        save_model(model, checkpoint_path)
        # converged before using the segment budget -> stop
        if model.fit_info["iterations"] < seg:
            break
    return model
