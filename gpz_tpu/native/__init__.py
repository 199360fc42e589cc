from gpz_tpu.native.ffi import (
    available,
    lbfgs_direction,
    lbfgs_add,
    modified_cholesky,
    read_csv,
)

__all__ = [
    "available",
    "lbfgs_direction",
    "lbfgs_add",
    "modified_cholesky",
    "read_csv",
]
