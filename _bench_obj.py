import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from bench import make_problem
from gpz_tpu.objective import nlog_ml
from jax.flatten_util import ravel_pytree

cfg, params, data = make_problem(n=100_000)
flat0, unravel = ravel_pytree(params)

ITERS = 10
@jax.jit
def run(flat, data):
    def body(i, acc):
        (f, aux), g = jax.value_and_grad(
            lambda q: nlog_ml(unravel(q), data, cfg, complete=True), has_aux=True
        )(flat + acc * 1e-30)
        return acc + f + g[0] * 1e-30
    return jax.lax.fori_loop(0, ITERS, body, 0.0)

_ = float(run(flat0, data))
t0 = time.perf_counter()
_ = float(run(flat0, data))
dt = (time.perf_counter() - t0) / ITERS
import os
tag = "pallas" if os.environ.get("GPZ_DISABLE_PALLAS") != "1" else "jnp"
print(f"objective fwd+bwd [{tag}]: {dt*1e3:.3f} ms/eval = {1/dt:.1f} evals/s")
