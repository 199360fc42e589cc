"""n-sharded objective + distributed training step.

The scale axis of GPz is n (training samples): every sample-indexed term of
the objective is an associative reduction (SURVEY §5 "long-context"), so the
whole objective runs SPMD with rows sharded over the `data` mesh axis and
psums exactly at the Gram / rhs / scalar-sum boundaries (objective.py's
`axis_name` plumbing). Parameters are replicated over `data` and (optionally)
sharded over `restart` for independent-restart ensembles.

Padding: shards must be equal-sized, so datasets are zero-padded with
omega == 0 rows — exact no-ops in every reduction (see Dataset docstring) —
and `n_eff` carries the true sample count into the 1/(n k) normalization.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpz_tpu.config import ModelConfig, TrainConfig
from gpz_tpu.dataset import Dataset, pad_dataset
from gpz_tpu.objective import nlog_ml, holdout_metrics
from gpz_tpu.optim import minimize
from gpz_tpu.parallel.mesh import DATA_AXIS, RESTART_AXIS


def _data_specs(data: Dataset) -> Dataset:
    """PartitionSpec pytree for a Dataset sharded on rows (structure mirrors
    the dataset: absent optional fields stay None)."""
    return Dataset(
        X=P(DATA_AXIS),
        mask=P(DATA_AXIS),
        omega=P(DATA_AXIS),
        Y=None if data.Y is None else P(DATA_AXIS),
        psi=None if data.psi is None else P(DATA_AXIS),
    )


def shard_dataset(data: Dataset, mesh: Mesh) -> Tuple[Dataset, jax.Array]:
    """Pad rows to a multiple of the data-axis size and device_put with row
    sharding. Returns (sharded dataset, n_eff scalar)."""
    n_dev = mesh.shape[DATA_AXIS]
    n = data.n
    n_pad = -(-n // n_dev) * n_dev
    padded = pad_dataset(data, n_pad)
    spec = _data_specs(padded)
    out = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        padded,
        spec,
    )
    return out, jnp.asarray(float(n), data.X.dtype)


def sharded_nlog_ml(params, data, cfg: ModelConfig, mesh: Mesh, n_eff,
                    complete: bool = False):
    """nlog_ml with rows sharded over the data mesh axis; value + aux are
    replicated on every device."""
    fn = jax.shard_map(
        lambda p, d, ne: nlog_ml(
            p, d, cfg, n_eff=ne, complete=complete, axis_name=DATA_AXIS
        ),
        mesh=mesh,
        in_specs=(P(), _data_specs(data), P()),
        out_specs=(P(), P()),
    )
    return fn(params, data, n_eff)


def sharded_holdout_metrics(params, w, data, cfg: ModelConfig, mesh: Mesh,
                            n_eff, complete: bool = False):
    fn = jax.shard_map(
        lambda p, ww, d, ne: holdout_metrics(
            p, ww, d, cfg, n_eff=ne, complete=complete, axis_name=DATA_AXIS
        ),
        mesh=mesh,
        in_specs=(P(), P(), _data_specs(data), P()),
        out_specs=(P(), P()),
    )
    return fn(params, w, data, n_eff)


def sharded_value_and_grad(unravel, cfg: ModelConfig, mesh: Mesh,
                           complete: bool = False):
    """Flat-vector objective for the L-BFGS optimizer, with the loss computed
    SPMD over the mesh. Gradients flow through the psums (their transpose is
    handled by XLA's SPMD partitioner).

    Returns fun(flat, data, n_eff, *ignored) — the dataset is a runtime
    argument (threaded through minimize's `args`) so the compiled training
    loop is reusable across same-shaped datasets."""
    from jax.flatten_util import ravel_pytree

    vg = jax.value_and_grad(
        lambda p, d, ne: sharded_nlog_ml(p, d, cfg, mesh, ne, complete),
        has_aux=True,
    )

    def fun(flat, data, n_eff, *_):
        (f, aux), g = vg(unravel(flat), data, n_eff)
        return f, ravel_pytree(g)[0], aux

    return fun


def train_sharded(
    params0,
    data: Dataset,
    cfg: ModelConfig,
    mesh: Mesh,
    *,
    valid_data: Optional[Dataset] = None,
    tc: Optional[TrainConfig] = None,
    complete: bool = False,
):
    """Distributed L-BFGS training: the full minimize loop is one jitted
    program whose objective evaluations run SPMD over the mesh.

    Returns (MinimizeResult, unravel). theta and the L-BFGS history are
    replicated (m is small); only the n-indexed tensors are sharded.
    """
    from jax.flatten_util import ravel_pytree

    tc = tc or TrainConfig()
    sdata, n_eff = shard_dataset(data, mesh)
    flat0, unravel = ravel_pytree(params0)
    fun = sharded_value_and_grad(unravel, cfg, mesh, complete)

    score_fn = None
    min_args = (sdata, n_eff)
    if valid_data is not None:
        svalid, n_eff_v = shard_dataset(valid_data, mesh)
        min_args = (sdata, n_eff, svalid, n_eff_v)

        def score_fn(flat, aux, _d, _ne, d_va, ne_va):
            rmse, ll = sharded_holdout_metrics(
                unravel(flat), aux.w, d_va, cfg, mesh, ne_va, complete
            )
            return ll, {"valid_rmse": rmse, "valid_ll": ll}

    res = minimize(
        fun,
        flat0,
        args=min_args,
        history=tc.history,
        max_iter=tc.max_iter,
        opt_tol=tc.opt_tol,
        prog_tol=tc.prog_tol,
        c1=tc.c1,
        c2=tc.c2,
        max_ls=tc.max_ls,
        score_fn=score_fn,
        max_attempts=tc.max_attempts,
    )
    return res, unravel


def ensemble_grad_step(stacked_params, data: Dataset, cfg: ModelConfig,
                       mesh: Mesh, n_eff, lr=1e-2, complete: bool = False):
    """One gradient step for R independent restarts on the 2-D mesh.

    stacked_params: pytree with leading restart axis R (R divisible by the
    restart mesh axis). Restarts are sharded over `restart`, rows over `data`;
    within a shard the local restarts are vmapped. This is the GPz analogue of
    expert/ensemble parallelism (SURVEY §2.3).
    """
    def local(sp, d, ne):
        def loss(p):
            return nlog_ml(
                p, d, cfg, n_eff=ne, complete=complete, axis_name=DATA_AXIS
            )[0]

        g = jax.vmap(jax.grad(loss))(sp)
        return jax.tree.map(lambda p, gg: p - lr * gg, sp, g)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(RESTART_AXIS), _data_specs(data), P()),
        out_specs=P(RESTART_AXIS),
    )
    return fn(stacked_params, data, n_eff)
