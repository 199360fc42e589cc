"""Demo-parity regression (BASELINE.md protocol step 2): the shipped f32
config must land inside the acceptance bands of the committed f64
port-of-record numbers (PARITY_NUMBERS.json, produced by
benchmarks/parity_numbers.py).

Only the small CI config runs here (sinc VL m=50 n=4000 — ~40 s on CPU);
the demo-scale configs are recorded in the committed table and re-checked
whenever the harness is rerun.
"""

import json
import os

import numpy as np
import pytest

TABLE = os.path.join(os.path.dirname(__file__), "..", "PARITY_NUMBERS.json")


@pytest.mark.skipif(not os.path.exists(TABLE),
                    reason="run benchmarks/parity_numbers.py first")
def test_shipped_matches_reference_small_sinc():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks"))
    from parity_numbers import run_config, TOLERANCES

    with open(TABLE) as fh:
        table = json.load(fh)
    ref = table["configs"]["sinc_VL_m50_small"]["reference"]

    shipped = run_config("sinc_VL_m50_small", "shipped")
    assert np.isfinite(shipped["rmse"]) and np.isfinite(shipped["mll"])
    assert shipped["rmse"] <= ref["rmse"] * (1 + TOLERANCES["rmse"]), (
        shipped, ref)
    assert shipped["mll"] >= ref["mll"] - TOLERANCES["mll"], (shipped, ref)


def test_check_parity_flags_nan_and_violations():
    """The harness must treat NaN as a violation and must flag every banded
    metric — a NaN mll in a committed table masked a real calibration
    failure for a whole round (VERDICT r3 weak #1)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks"))
    from parity_numbers import check_parity

    ref = {"rmse": 0.034, "mll": 2.64, "fr15": 99.8, "fr05": 97.0,
           "bias": -0.0005}
    ok = {"rmse": 0.034, "mll": 2.64, "fr15": 99.9, "fr05": 97.1,
          "bias": 0.0007}
    assert check_parity({"c": {"reference": ref, "shipped": ok}}) == []

    for key, bad_val in [("mll", float("nan")), ("mll", 2.24),
                         ("rmse", 0.05), ("fr15", 95.0), ("fr05", 90.0),
                         ("bias", 0.01)]:
        sh = dict(ok, **{key: bad_val})
        bad = check_parity({"c": {"reference": ref, "shipped": sh}})
        assert bad and bad[0][1] == key, (key, bad_val, bad)

    # committed table must itself be clean
    if os.path.exists(TABLE):
        with open(TABLE) as fh:
            table = json.load(fh)
        assert check_parity(table["configs"]) == []
