"""Training at the BASELINE configs[4] scale on one chip (VERDICT r3
item 3): m=1000 VC heteroscedastic on >= 1M rows — TRAINING, not just
prediction. Records grad evals/s, a finite monotone loss trace, the optimizer's
termination status, and a peak-memory note into BENCH_SCALE_r05.json
(override with --out; run the script twice to record the second-process
wall through the persistent cache + AOT executable cache).

The O(n m) design matrix at this scale is 4 GB f32 (1M x 1000); the row
paths that make it fit are phi.PHI_BLOCK_ROWS rematerialization and the
chunked Ozaki Gram accumulation (objective.OZAKI_CHUNK). 10M x 1000
(40 GB) does NOT fit one chip's HBM without never materializing PHI —
that regime is the n-sharded multi-host path (parallel/sharded.py).

Usage:  python benchmarks/scale_train.py [--rows 1000000] [--m 1000]
                                         [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT_DEFAULT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "BENCH_SCALE_r05.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--m", type=int, default=1000)
    ap.add_argument("--d", type=int, default=5)
    ap.add_argument("--iters", type=int, default=60,
                    help="L-BFGS iteration budget (VERDICT r4 #6: >= 50 "
                    "iterations with a genuine termination status; full "
                    "convergence at this scale is a multi-host job)")
    ap.add_argument("--out", default=OUT_DEFAULT)
    ap.add_argument("--skip-warm", action="store_true",
                    help="skip the in-process warm repeat (the cross-"
                    "process warm story comes from running the script "
                    "twice)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    import gpz_tpu
    from gpz_tpu.data import synthetic_sdss
    from gpz_tpu.model import _make_dataset
    from gpz_tpu import datautils
    from gpz_tpu.objective import nlog_ml
    from gpz_tpu.optim import minimize

    n = args.rows
    t0 = time.time()
    mags, errs, z = synthetic_sdss(n=n, filters=args.d, seed=3)
    psi = errs**2
    print(json.dumps({"stage": "data", "rows": n, "seconds":
                      round(time.time() - t0, 1)}), flush=True)

    t0 = time.time()
    model = gpz_tpu.init(mags, z, "VC", args.m, heteroscedastic=True,
                         psi=psi, seed=1, dtype="float32")
    print(json.dumps({"stage": "init", "seconds": round(time.time() - t0, 1)}),
          flush=True)

    cfg = model.cfg
    Xn = (mags - model.muX[None]) / model.sdX[None]
    Yc = (z - model.muY[0]).reshape(n, 1)
    psi_c = datautils.fix_psi(psi, n, model.sdX, True)
    data = _make_dataset(Xn, Yc, psi_c, np.ones(n), np.ones(n, bool),
                         jnp.float32)

    flat0, unravel = ravel_pytree(model.last.params)
    vg = jax.value_and_grad(
        lambda p, d: nlog_ml(p, d, cfg, complete=True), has_aux=True)

    def fun(flat, d):
        (f, aux), g = vg(unravel(flat), d)
        return f, ravel_pytree(g)[0], aux

    t0 = time.time()
    res = minimize(fun, flat0, args=(data,), max_iter=args.iters,
                   history=10, record_len=64,
                   aot_key=f"scale_train:{cfg!r}")
    jax.block_until_ready(res.x)
    wall = time.time() - t0

    n_it = int(res.iterations)
    evals = int(res.fun_evals)
    f_tr = np.asarray(res.trace["f"])[: n_it + 1]
    finite = bool(np.all(np.isfinite(f_tr)))
    monotone = bool(np.all(np.diff(f_tr) <= 1e-6))

    # second call = warm executable: the honest evals/s (first call carries
    # the compile)
    wall_warm = None
    if not args.skip_warm:
        t0 = time.time()
        res2 = minimize(fun, flat0, args=(data,), max_iter=args.iters,
                        history=10, record_len=64,
                        aot_key=f"scale_train:{cfg!r}")
        jax.block_until_ready(res2.x)
        wall_warm = time.time() - t0

    mem = {}
    try:
        ms = jax.devices()[0].memory_stats()
        if ms:
            mem = {
                "peak_bytes_in_use": int(ms.get("peak_bytes_in_use", -1)),
                "bytes_limit": int(ms.get("bytes_limit", -1)),
            }
    except Exception:
        pass

    status_names = {1: "optimal", 2: "step_too_small", 3: "max_iter",
                    4: "early_stop", 5: "ls_failed", 6: "no_descent"}
    status = int(res.status)
    out = {
        "config": {"rows": n, "m": args.m, "d": args.d, "method": "VC",
                   "heteroscedastic": True, "psi": True,
                   "iters": args.iters},
        "backend": jax.default_backend(),
        "iterations": n_it,
        "fun_evals": evals,
        "status": status,
        "status_name": status_names.get(status, f"unknown({status})"),
        "loss_trace": [round(float(v), 6) for v in f_tr],
        "trace_finite": finite,
        "trace_monotone": monotone,
        "wall_first_call_s": round(wall, 1),
        "wall_warm_call_s": (
            None if wall_warm is None else round(wall_warm, 1)
        ),
        "grad_evals_per_sec_warm": (
            None if wall_warm is None else round(evals / wall_warm, 3)
        ),
        "memory": mem,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
