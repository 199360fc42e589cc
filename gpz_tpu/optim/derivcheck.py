"""Gradient checking utilities — parity with the reference's derivative-check
harness (ref minFunc/autoDif/derivativeCheck.m:28-41, autoGrad.m), which was
the only correctness tool the 263-line hand gradient ever had. Here the roles
are reversed: jax.grad is the trusted reference and these utilities validate
custom kernels / hand-written VJPs against finite differences.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def numerical_gradient(
    f: Callable, x: jax.Array, eps: float = 1e-6, order: int = 2
) -> np.ndarray:
    """Finite-difference gradient (order 1 = forward, 2 = central; the
    reference's autoGrad types 1/2)."""
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    f0 = float(f(jnp.asarray(x))) if order == 1 else None
    for i in range(x.size):
        e = np.zeros_like(x)
        e.flat[i] = eps
        fp = float(f(jnp.asarray(x + e)))
        if order == 1:
            g.flat[i] = (fp - f0) / eps
        else:
            fm = float(f(jnp.asarray(x - e)))
            g.flat[i] = (fp - fm) / (2 * eps)
    return g


def check_gradient(
    f: Callable,
    x: jax.Array,
    eps: float = 1e-6,
    rtol: float = 1e-4,
    atol: float = 1e-7,
    verbose: bool = False,
) -> Tuple[bool, float]:
    """Compare jax.grad(f) against central differences at x.

    Returns (ok, max_abs_err). The tolerance default mirrors the reference's
    1e-4 threshold (derivativeCheck.m:35).
    """
    g = np.asarray(jax.grad(f)(jnp.asarray(x)))
    gn = numerical_gradient(f, x, eps=eps)
    err = np.abs(g - gn)
    scale = np.maximum(np.abs(gn), 1.0)
    ok = bool(np.all(err <= rtol * scale + atol))
    if verbose:
        print(f"max abs err {err.max():.3e}; max rel err {(err / scale).max():.3e}")
    return ok, float(err.max())
