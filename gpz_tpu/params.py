"""Model parameters as a typed pytree.

The reference packs everything into one flat vector because minFunc requires it
(ref GPz/init.m:87,97: theta = [P(:);Gamma(:);lnAlpha(:);b(:);v(:);lnTau(:)]).
Here parameters are a structured pytree; the jit-compiled L-BFGS flattens with
`ravel_pytree` internally, so the model code never deals with offsets.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from gpz_tpu.config import ModelConfig


import dataclasses


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GPzParams:
    """GPz hyperparameters.

    Fields (ref theta layout, GPz/init.m:87,97):
      P        (m, d)  basis centers
      gamma    method-dependent canonical shape (see ModelConfig.gamma_shape);
               for the diagonal family gamma is the inverse length-scale
               (Sigma_diag = gamma**-2, ref getPHI.m:93); for the full family
               the Cholesky-like factor with iSigma = gamma^T gamma
               (ref getPHI.m:73)
      ln_alpha (m, k)  log precision of the weight prior
      b        (k,)    log noise variance offset
      v        (m, k)  heteroscedastic basis weights (None if homoscedastic)
      ln_tau   (m, k)  log precision of the prior on v (None if homoscedastic)
    """

    P: jax.Array
    gamma: jax.Array
    ln_alpha: jax.Array
    b: jax.Array
    v: Optional[jax.Array] = None
    ln_tau: Optional[jax.Array] = None

    @property
    def heteroscedastic(self) -> bool:
        return self.v is not None

    def astype(self, dtype) -> "GPzParams":
        return jax.tree.map(lambda x: x.astype(dtype), self)

    def flatten(self):
        """Flat vector + unravel closure (for optimizers / serialization)."""
        return ravel_pytree(self)

    def expand_gamma(self, cfg: ModelConfig) -> jax.Array:
        """Broadcast canonical gamma to the working shape.

        (m, d) for GL/VL/GD/VD; (m, d, d) for GC/VC. Gradients w.r.t. the
        canonical parameter are automatically summed over broadcast axes,
        reproducing ref GPz/GPz.m:215-225.
        """
        return jnp.broadcast_to(self.gamma, cfg.gamma_expanded_shape)


def zeros_like_params(params: GPzParams) -> GPzParams:
    return jax.tree.map(jnp.zeros_like, params)
