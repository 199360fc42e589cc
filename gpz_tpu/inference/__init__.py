from gpz_tpu.inference.mcmc import hmc_sample, gpz_log_posterior, split_rhat
from gpz_tpu.inference.nuts import nuts_sample
from gpz_tpu.inference.vi import advi_fit
from gpz_tpu.inference.api import sample_posterior, predictive_draws

__all__ = [
    "hmc_sample",
    "gpz_log_posterior",
    "split_rhat",
    "nuts_sample",
    "advi_fit",
    "sample_posterior",
    "predictive_draws",
]
