"""Canonical on-device dataset container.

The reference threads (X, Y, Psi, omega, training-selection) through every
call (ref GPz/GPz.m:1, GPz/train.m:40); here they are one pytree with NaNs
already converted to (zero-filled X, boolean mask) so that every downstream op
is static-shape masked dense math.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Dataset:
    """Preprocessed training/inference data.

    X     (n, d)  inputs, zero-filled where missing, already normalized
    Y     (n, k)  centered targets (None at pure-inference time)
    mask  (n, d)  True where X is observed (ref: NaN pattern grouping,
                  getPHI.m:43-54 — replaced by this mask)
    psi   input-noise variances, already rescaled by sdX (ref GPz/fixPsi.m):
          None | (n, d) diagonal per-row | (n, d, d) full covariance per-row
    omega (n,)    cost-sensitive sample weights (ref GPz/getOmega.m); also the
                  padding mechanism: rows with omega == 0 contribute exactly
                  zero to every reduction in the objective, which is how
                  shard-padding stays exact.
    """

    X: jax.Array
    mask: jax.Array
    omega: jax.Array
    Y: Optional[jax.Array] = None
    psi: Optional[jax.Array] = None

    @property
    def n(self) -> int:
        return self.X.shape[0]

    @property
    def d(self) -> int:
        return self.X.shape[1]

    def __getitem__(self, idx) -> "Dataset":
        """Row-subset (host-side, for train/valid/test splits)."""
        return Dataset(
            X=self.X[idx],
            mask=self.mask[idx],
            omega=self.omega[idx],
            Y=None if self.Y is None else self.Y[idx],
            psi=None if self.psi is None else self.psi[idx],
        )


def pad_dataset(data: Dataset, target_n: int) -> Dataset:
    """Pad to `target_n` rows with omega=0 rows (exact no-ops in the loss)."""
    n = data.n
    if n == target_n:
        return data
    if n > target_n:
        raise ValueError(f"cannot pad {n} rows down to {target_n}")
    pad = target_n - n

    def pad0(x):
        if x is None:
            return None
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    return Dataset(
        X=pad0(data.X),
        # padded rows are marked fully observed so PHI stays finite
        mask=jnp.pad(data.mask, [(0, pad), (0, 0)], constant_values=True),
        omega=pad0(data.omega),
        Y=pad0(data.Y),
        psi=pad0(data.psi),
    )
