from gpz_tpu.parallel.mesh import make_mesh, DATA_AXIS, RESTART_AXIS
from gpz_tpu.parallel import distributed
from gpz_tpu.parallel.sharded import (
    shard_dataset,
    sharded_value_and_grad,
    sharded_nlog_ml,
    sharded_holdout_metrics,
    train_sharded,
    ensemble_grad_step,
)

__all__ = [
    "make_mesh",
    "DATA_AXIS",
    "RESTART_AXIS",
    "shard_dataset",
    "sharded_value_and_grad",
    "sharded_nlog_ml",
    "sharded_holdout_metrics",
    "train_sharded",
    "ensemble_grad_step",
    "distributed",
]
