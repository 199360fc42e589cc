"""Worker process for tests/test_distributed.py: one rank of a 2-process
jax.distributed CPU run exercising the multi-host entry path
(initialize -> host_row_range -> global_dataset -> sharded objective ->
one train_sharded step). Ref: gpz_tpu/parallel/distributed.py docstring;
SURVEY §4 item 4 (the reference has no multi-node testing at all).

Usage: python distributed_worker.py <coordinator> <n_procs> <pid> <outfile>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from gpz_tpu.config import ModelConfig, TrainConfig
from gpz_tpu.dataset import Dataset
from gpz_tpu.params import GPzParams
from gpz_tpu.objective import nlog_ml
from gpz_tpu.parallel import distributed as dist
from gpz_tpu.parallel import make_mesh, train_sharded
from gpz_tpu.parallel.sharded import sharded_nlog_ml


def build_global_problem(n, d, m, k, seed=5):
    """Deterministic problem every rank can regenerate in full."""
    rng = np.random.default_rng(seed)
    cfg = ModelConfig(m=m, d=d, k=k, method="VD", dtype="float64")
    X = rng.standard_normal((n, d))
    Y = rng.standard_normal((n, k))
    psi = 0.05 + 0.1 * rng.random((n, d))
    omega = 0.5 + rng.random(n)
    params = GPzParams(
        P=jnp.asarray(rng.standard_normal((m, d))),
        gamma=jnp.asarray(0.8 + 0.4 * rng.random((m, d))),
        ln_alpha=jnp.zeros((m, k)),
        b=jnp.zeros((k,)),
        v=jnp.zeros((m, k)),
        ln_tau=jnp.zeros((m, k)),
    )
    return cfg, params, X, Y, psi, omega


def main():
    coordinator, n_procs, pid, outfile = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    dist.initialize(coordinator, n_procs, pid)
    assert jax.process_count() == n_procs, jax.process_count()
    assert len(jax.devices()) == 4 * n_procs, len(jax.devices())

    n, d, m, k = 64, 3, 6, 1
    cfg, params, X, Y, psi, omega = build_global_problem(n, d, m, k)

    # each rank loads ONLY its host_row_range slice (the multi-host data
    # loading contract)
    lo, hi = dist.host_row_range(n)
    local = Dataset(
        X=jnp.asarray(X[lo:hi]),
        mask=jnp.ones((hi - lo, d), bool),
        omega=jnp.asarray(omega[lo:hi]),
        Y=jnp.asarray(Y[lo:hi]),
        psi=jnp.asarray(psi[lo:hi]),
    )
    mesh = make_mesh(n_data=4 * n_procs, n_restart=1)
    gdata, n_eff = dist.global_dataset(local, mesh)
    assert float(n_eff) == float(n)

    f, aux = sharded_nlog_ml(params, gdata, cfg, mesh, n_eff, complete=True)

    # single-process oracle: every rank recomputes the full-data objective
    full = Dataset(
        X=jnp.asarray(X), mask=jnp.ones((n, d), bool),
        omega=jnp.asarray(omega), Y=jnp.asarray(Y), psi=jnp.asarray(psi),
    )
    f_ref, aux_ref = nlog_ml(params, full, cfg, complete=True)

    # one real distributed training step (the jitted L-BFGS while_loop over
    # the SPMD objective, psums riding the cross-process collectives)
    res, _ = train_sharded(
        params, full, cfg, mesh,
        tc=TrainConfig(max_iter=2, history=4, verbose=False),
        complete=True,
    )

    # --- psi=None over the same mesh (VERDICT r4 #9: the input-noise-free
    # code path has different design-matrix structure; exercise it across
    # the process boundary too) ---
    local_nopsi = Dataset(
        X=local.X, mask=local.mask, omega=local.omega, Y=local.Y, psi=None,
    )
    gdata2, n_eff2 = dist.global_dataset(local_nopsi, mesh)
    f2, _ = sharded_nlog_ml(params, gdata2, cfg, mesh, n_eff2,
                            complete=True)
    full_nopsi = Dataset(X=full.X, mask=full.mask, omega=full.omega,
                         Y=full.Y, psi=None)
    f2_ref, _ = nlog_ml(params, full_nopsi, cfg, complete=True)

    # --- unequal local row counts: n=63 across 2 hosts loads 32/31 rows;
    # pad_dataset brings every host to the max local count with omega=0
    # rows (exact no-ops), global_dataset then assembles and counts only
    # real rows ---
    from gpz_tpu.dataset import pad_dataset

    n3 = 63
    cfg3, params3, X3, Y3, psi3, omega3 = build_global_problem(
        n3, d, m, k, seed=11
    )
    lo3, hi3 = dist.host_row_range(n3)
    local3 = Dataset(
        X=jnp.asarray(X3[lo3:hi3]),
        mask=jnp.ones((hi3 - lo3, d), bool),
        omega=jnp.asarray(omega3[lo3:hi3]),
        Y=jnp.asarray(Y3[lo3:hi3]),
        psi=jnp.asarray(psi3[lo3:hi3]),
    )
    target = -(-n3 // n_procs)
    local3p = pad_dataset(local3, target)
    gdata3, n_eff3 = dist.global_dataset(local3p, mesh)
    f3, _ = sharded_nlog_ml(params3, gdata3, cfg3, mesh, n_eff3,
                            complete=True)
    full3 = Dataset(
        X=jnp.asarray(X3), mask=jnp.ones((n3, d), bool),
        omega=jnp.asarray(omega3), Y=jnp.asarray(Y3),
        psi=jnp.asarray(psi3),
    )
    f3_ref, _ = nlog_ml(params3, full3, cfg3, complete=True)

    out = {
        "pid": pid,
        "process_count": jax.process_count(),
        "f_sharded": float(f),
        "f_single": float(f_ref),
        "w_max_diff": float(jnp.max(jnp.abs(aux.w - aux_ref.w))),
        "train_f0": float(np.asarray(res.trace["f"])[0]),
        "train_f_end": float(res.f),
        "train_finite": bool(np.isfinite(float(res.f))),
        "row_range": [lo, hi],
        "f_sharded_nopsi": float(f2),
        "f_single_nopsi": float(f2_ref),
        "f_sharded_unequal": float(f3),
        "f_single_unequal": float(f3_ref),
        "n_eff_unequal": float(n_eff3),
        "local_rows_unequal": int(hi3 - lo3),
    }
    with open(outfile, "w") as fh:
        json.dump(out, fh)
    print("WORKER_OK", pid)


if __name__ == "__main__":
    main()
