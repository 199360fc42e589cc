"""Hard-regime benchmark (VERDICT r3 item 7 / weak #7): per-eval cost where
the wall clock is actually spent.

bench.py's headline measures the mixed objective at an init-like parameter
point — the easy regime. Late in training cond(SIGMA) reaches ~1e9 and the
equilibrated-f32 fast solve may take its strict-f64 fallback
(linalg.fast_solve_w_logdet), and the convergence endgame runs the
emulated-f64 strict objective. This bench evaluates, at a committed TRAINED
parameter set (benchmarks/photoz_trained_m100.npz — the shipped photo-z
VC m=100 model, see parity_numbers.py):

  * mixed (shipped-phase-1) objective+grad evals/s at the trained point
  * the fast-solve fallback rate at that point (linalg.fast_solve_ok)
  * strict-f64 (refine-phase) objective+grad evals/s at the trained point

Usage:  python benchmarks/hard_regime_bench.py
Writes HARD_BENCH.json at the repo root; one JSON line per case.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "HARD_BENCH.json")
CKPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "photoz_trained_m100.npz")


def main():
    import jax
    import jax.numpy as jnp

    import gpz_tpu
    from gpz_tpu import checkpoint, datautils
    from gpz_tpu.model import _make_dataset
    from gpz_tpu.objective import nlog_ml, _gram_terms
    from gpz_tpu.linalg import fast_solve_ok
    from parity_numbers import photoz_data

    model = checkpoint.load_model(CKPT)
    X, Y, psi, omega, tr, va, te = photoz_data()
    Xn = (X - model.muX[None]) / model.sdX[None]
    Yc = (Y - model.muY[None]).reshape(len(Y), -1)
    psi_c = datautils.fix_psi(psi, len(Y), model.sdX, True)

    def timed_evals(cfg, params, data, iters=20):
        @jax.jit
        def run(p0, d):
            def body(i, acc):
                p = jax.tree.map(lambda x: x + acc * 1e-30, p0)
                (f, aux), g = jax.value_and_grad(
                    lambda q: nlog_ml(q, d, cfg, complete=True),
                    has_aux=True,
                )(p)
                return acc + f + g.P[0, 0] * 1e-30
            return jax.lax.fori_loop(0, iters, body, 0.0)

        float(run(params, data))             # compile + warm
        t0 = time.perf_counter()
        float(run(params, data))
        return iters / (time.perf_counter() - t0)

    results = {"backend": jax.default_backend()}

    # mixed phase at the trained (late-training) point
    cfg32 = dataclasses.replace(model.cfg, solve_mode="auto",
                                solve_dtype="auto")
    params32 = model.best.params
    data32 = _make_dataset(Xn, Yc, psi_c, omega, tr, jnp.float32)
    r = timed_evals(cfg32, params32, data32)
    results["mixed_evals_per_sec_trained_point"] = round(r, 2)
    print(json.dumps({"case": "mixed_trained", "evals_per_sec": round(r, 2)}))

    # fast-solve fallback rate at that point: build the actual SIGMA/rhs the
    # mixed phase solves and probe the ok flag
    gt = jax.jit(
        lambda p, d: _gram_terms(p, cfg32, d, True)[5:9],
        static_argnames=(),
    )
    SIGMA, logdet, w, rhs = gt(params32, data32)
    ok = bool(jax.jit(fast_solve_ok)(SIGMA, rhs))
    results["fast_solve_ok_at_trained_point"] = ok
    results["cond_note"] = (
        "ok=True -> fast path serves the late-training Gram; False -> every"
        " eval pays the strict-f64 fallback on top of the failed fast one"
    )
    print(json.dumps({"case": "fast_solve_ok", "ok": ok}))

    # f64 refine phase at the trained point
    cfg64 = dataclasses.replace(model.cfg, dtype="float64",
                                solve_mode="strict", solve_dtype="float64")
    params64 = jax.tree.map(lambda a: a.astype(jnp.float64), params32)
    data64 = _make_dataset(Xn, Yc, psi_c, omega, tr, jnp.float64)
    r64 = timed_evals(cfg64, params64, data64, iters=5)
    results["f64_refine_evals_per_sec_trained_point"] = round(r64, 2)
    print(json.dumps({"case": "f64_refine_trained",
                      "evals_per_sec": round(r64, 2)}))

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({"written": os.path.basename(OUT)}))


if __name__ == "__main__":
    main()
