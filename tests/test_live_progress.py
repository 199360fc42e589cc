"""Live per-iteration progress streaming (VERDICT r4 item 7).

The reference prints one table row per optimizer iteration from its
outputFcn (ref GPz/callBack.m:16-46). gpz_tpu's whole training loop is one
`lax.while_loop`, so rows are streamed from inside the jitted loop via
`jax.debug.callback` (optim.lbfgs `iter_callback`, wired through
model.train when TrainConfig.verbose). These tests capture stdout during a
short run and assert the rows actually appear DURING optimization, not
only in the post-hoc table.
"""

import numpy as np
import jax
import jax.numpy as jnp

import gpz_tpu
from gpz_tpu.optim.lbfgs import minimize


def test_minimize_streams_iteration_rows():
    rows = []

    def cb(it, f, opt_cond, step, score, improved, extras):
        rows.append((int(it), float(f)))

    def fun(x):
        f = 0.5 * jnp.sum(x.astype(jnp.float64) ** 2)
        return f, x, ()

    x0 = jnp.asarray(np.full(4, 2.0), jnp.float32)
    res = minimize(fun, x0, max_iter=5, iter_callback=cb)
    jax.effects_barrier()  # drain pending debug callbacks
    its = sorted(r[0] for r in rows)
    # row 0 (the initial evaluation) plus one row per completed iteration
    assert its[0] == 0
    assert its[-1] == int(res.iterations)
    # row 0 carries f(x0) = 0.5 * 4 * 2^2 = 8
    assert abs(dict(rows)[0] - 8.0) < 1e-6
    # the final row's f matches the result
    assert abs(dict(rows)[its[-1]] - float(res.f)) < 1e-12


def test_train_verbose_streams_live_rows(capsys):
    rng = np.random.default_rng(0)
    n = 200
    X = rng.standard_normal((n, 2))
    y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(n)
    va = np.zeros(n, bool)
    va[150:] = True
    tr = ~va
    model = gpz_tpu.init(X, y, "VD", 8, training=tr, seed=0)
    model = gpz_tpu.train(
        model, X, y, training=tr, validation=va, max_iter=5, verbose=True,
    )
    jax.effects_barrier()
    out = capsys.readouterr().out
    # the live header is distinguished from the post-hoc table's by its
    # wall-clock column
    assert "Valid MLL\tTime" in out
    # at least the initial row and one optimization row were streamed
    live_rows = [
        ln for ln in out.splitlines()
        if ln.startswith("\t") and ln.count("\t") >= 7
    ]
    assert len(live_rows) >= 2, out
    # the post-hoc summary table still prints (VERDICT: "post-hoc table
    # unchanged")
    assert f"[{model.fit_info['iterations']} iters" in out


def test_train_quiet_stays_quiet(capsys):
    rng = np.random.default_rng(1)
    n = 120
    X = rng.standard_normal((n, 2))
    y = np.sin(X[:, 0])
    model = gpz_tpu.init(X, y, "VD", 6, seed=0)
    model = gpz_tpu.train(model, X, y, max_iter=3, verbose=False)
    jax.effects_barrier()
    assert capsys.readouterr().out == ""
