"""1-D sinc demo (ref demo_sinc.m): heteroscedastic noise + gamma-distributed
input noise + a gap in the training support.

Run: python demos/demo_sinc.py [--m 100] [--method VL] [--max-iter 500]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math

import numpy as np

import gpz_tpu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=100)
    ap.add_argument("--method", default="VL")
    ap.add_argument("--max-iter", type=int, default=500)
    ap.add_argument("--max-attempts", type=int, default=50)
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--no-input-noise", action="store_true")
    ap.add_argument("--dtype", default="float64")
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    fx = lambda x: np.sinc(x / math.pi)  # sin(x)/x
    sx = lambda x: 0.05 + (1 / (1 + np.exp(-0.2 * x))) * (1 + np.sin(2 * x)) * 0.2

    X = np.linspace(-10, 10, args.n)
    X = X[(X < -7) | (X > -2)]  # gap in support (ref demo_sinc.m:32)
    n = len(X)
    Y = fx(X) + rng.standard_normal(n) * sx(X)

    if args.no_input_noise:
        psi = None
    else:
        E, V = 0.5, 0.25
        psi = rng.gamma(E**2 / V, V / E, size=n)
        X = X + rng.standard_normal(n) * np.sqrt(psi)

    tr, va, te = gpz_tpu.datautils.split(n, 0.7, 0.15, 0.15, rng)

    model = gpz_tpu.init(
        X[:, None], Y, args.method, args.m,
        heteroscedastic=True, training=tr, psi=psi,
        seed=args.seed, dtype=args.dtype,
    )
    model = gpz_tpu.train(
        model, X[:, None], Y, training=tr, validation=va, psi=psi,
        max_iter=args.max_iter, max_attempts=args.max_attempts,
    )

    pred = gpz_tpu.predict(X[:, None], model, psi=psi, selection=te)
    err = Y[te] - pred.mu[:, 0]
    rmse = float(np.sqrt(np.mean(err**2)))
    mll = float(
        np.mean(-0.5 * err**2 / pred.sigma[:, 0] - 0.5 * np.log(pred.sigma[:, 0]))
        - 0.5 * math.log(2 * math.pi)
    )
    print("Scores on Test Set")
    print("RMSE\t\tMLL")
    print(f"{rmse:.6f}\t{mll:.6f}")


if __name__ == "__main__":
    main()
