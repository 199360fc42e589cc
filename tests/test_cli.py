"""CLI end-to-end: train from CSV -> checkpoint -> predict -> metrics."""

import json
import os

import numpy as np
import pytest

from gpz_tpu.cli import main
from gpz_tpu.data import synthetic_sdss


def test_cli_train_predict_roundtrip(tmp_path, capsys):
    mags, errs, z = synthetic_sdss(n=800, seed=5)
    csv_in = tmp_path / "sample.csv"
    np.savetxt(csv_in, np.column_stack([mags, errs, z]), delimiter=",")

    model_path = tmp_path / "model.npz"
    rc = main([
        "train", str(csv_in), "--out", str(model_path),
        "--method", "VD", "--m", "8", "--max-iter", "20",
        "--dtype", "float64",
    ])
    assert rc is None or rc == 0
    assert os.path.exists(model_path)
    out = capsys.readouterr().out
    info = json.loads(out.strip().splitlines()[-1])
    assert info["iterations"] > 0

    pred_path = tmp_path / "pred.csv"
    rc = main([
        "predict", str(csv_in), "--model", str(model_path),
        "--out", str(pred_path), "--has-target", "--has-errors",
    ])
    assert rc is None or rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    metrics = json.loads(lines[0])
    assert metrics["n"] == 800
    assert metrics["rmse"] < np.std(z)

    pred = np.loadtxt(pred_path, delimiter=",", skiprows=1)
    assert pred.shape == (800, 6)
    assert np.all(np.isfinite(pred))
