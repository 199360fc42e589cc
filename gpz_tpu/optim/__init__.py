from gpz_tpu.optim.lbfgs import minimize, MinimizeResult

__all__ = ["minimize", "MinimizeResult"]
