from gpz_tpu.optim.lbfgs import minimize, MinimizeResult
from gpz_tpu.optim.host_lbfgs import minimize_host
from gpz_tpu.optim.solvers import (
    METHODS,
    armijo_backtrack,
    conj_grad,
    minimize_any,
    numerical_hvp,
)
from gpz_tpu.optim.derivcheck import check_gradient, numerical_gradient

__all__ = [
    "minimize",
    "MinimizeResult",
    "minimize_host",
    "minimize_any",
    "METHODS",
    "armijo_backtrack",
    "conj_grad",
    "numerical_hvp",
    "check_gradient",
    "numerical_gradient",
]
