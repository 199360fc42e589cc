from gpz_tpu.optim.lbfgs import minimize, MinimizeResult
from gpz_tpu.optim.host_lbfgs import minimize_host
from gpz_tpu.optim.derivcheck import check_gradient, numerical_gradient

__all__ = [
    "minimize",
    "MinimizeResult",
    "minimize_host",
    "check_gradient",
    "numerical_gradient",
]
