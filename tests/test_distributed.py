"""Multi-process jax.distributed tests (VERDICT r3 item 5, r4 #9): 2 CPU
processes x 4 virtual devices each, coordinator on localhost. End-to-end
exercise of the multi-host entry path — `distributed.initialize` ->
`host_row_range` -> `global_dataset` -> SPMD objective -> one
`train_sharded` step — asserting equality with the single-process result,
plus the psi=None and unequal-local-rows (`pad_dataset`) variants and the
initialize failure-propagation contract.

The 2-process job runs ONCE (module fixture); each scenario's assertions
are a separate test so a failure names the broken layer directly. The
reference has no distributed machinery at all (SURVEY §2.3); this is the
net-new framework layer's integration suite.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def dist_results(tmp_path_factory):
    """Results of the 2-process x 4-device jax.distributed worker run,
    one dict per rank."""
    tmp_path = tmp_path_factory.mktemp("dist")
    n_procs = 2
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # the workers configure their own backend; scrub anything that would
    # preselect one or share a compile cache with this process
    env.pop("JAX_PLATFORMS", None)
    outfiles = [str(tmp_path / f"rank{i}.json") for i in range(n_procs)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(n_procs), str(i),
             outfiles[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(n_procs)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outputs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"rank {i} failed:\n{outputs[i][-4000:]}"
        )

    results = []
    for f in outfiles:
        with open(f) as fh:
            results.append(json.load(fh))
    return results


def test_two_process_distributed_matches_single(dist_results):
    results = dist_results
    for r in results:
        assert r["process_count"] == 2
        # sharded == single-process objective, f64 => tight
        np.testing.assert_allclose(r["f_sharded"], r["f_single"],
                                   rtol=1e-12)
        assert r["w_max_diff"] < 1e-9

    # the two ranks computed identical replicated results
    np.testing.assert_allclose(results[0]["f_sharded"],
                               results[1]["f_sharded"], rtol=0)
    # and loaded disjoint, covering row ranges
    r0, r1 = results[0]["row_range"], results[1]["row_range"]
    assert r0[1] == r1[0] and r0[0] == 0 and r1[1] == 64


def test_two_process_train_step_progresses(dist_results):
    results = dist_results
    for r in results:
        assert r["train_finite"]
        assert r["train_f_end"] < r["train_f0"]  # the step made progress
    np.testing.assert_allclose(results[0]["train_f_end"],
                               results[1]["train_f_end"], rtol=0)


def test_two_process_psi_none(dist_results):
    """psi=None across the process boundary (VERDICT r4 #9)."""
    for r in dist_results:
        np.testing.assert_allclose(r["f_sharded_nopsi"],
                                   r["f_single_nopsi"], rtol=1e-12)


def test_two_process_unequal_local_rows(dist_results):
    """Unequal local row counts (63 rows -> 32/31), padded with omega=0
    rows via pad_dataset before global assembly: exact equality with the
    63-row single-process oracle, and n_eff counts only real rows."""
    results = dist_results
    assert sorted(r["local_rows_unequal"] for r in results) == [31, 32]
    for r in results:
        assert r["n_eff_unequal"] == 63.0
        np.testing.assert_allclose(r["f_sharded_unequal"],
                                   r["f_single_unequal"], rtol=1e-12)


def test_initialize_explicit_args_propagate_failures(monkeypatch):
    """Explicit-argument initialize must RAISE on failure (a swallowed
    error silently degrades a multi-host run to one process); the
    env-discovery path must swallow only the no-coordinator case
    (single-process usage). Deterministic contract test — the network
    paths are exercised by the 2-process run above."""
    import jax

    from gpz_tpu.parallel import distributed as dist

    calls = {}

    def fake_init(**kw):
        calls.update(kw)
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    monkeypatch.setattr(jax.distributed, "initialize", fake_init)

    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        dist.initialize("10.0.0.1:1234", 2, 0)
    assert calls == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 2,
        "process_id": 0,
    }

    # env path: a no-coordinator RuntimeError means single-process usage
    def fake_init_env(*a, **kw):
        raise RuntimeError("no coordinator found")

    monkeypatch.setattr(jax.distributed, "initialize", fake_init_env)
    dist.initialize()  # must not raise

    # idempotence: once initialized, nothing is re-attempted
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)

    def boom(*a, **kw):
        raise AssertionError("re-initialized")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    dist.initialize("10.0.0.1:1234", 2, 0)
