from gpz_tpu.inference.mcmc import hmc_sample, gpz_log_posterior
from gpz_tpu.inference.vi import advi_fit

__all__ = ["hmc_sample", "gpz_log_posterior", "advi_fit"]
