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
