"""Test configuration: 8 virtual CPU devices + float64 for parity tests.

Must run before the first JAX backend initialization. The axon TPU plugin is
registered at interpreter start via sitecustomize, so the platform is forced
back to CPU through jax.config (env vars alone are too late).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# GPZ_TPU_TESTS=1 leaves the real TPU visible so tests/test_tpu.py can run
# compiled-on-silicon checks (VERDICT r2 item 6); everything else runs on the
# virtual CPU mesh. run_tests.py gives the TPU module its own process.
if os.environ.get("GPZ_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the sharded/while-loop programs are expensive
# to compile on CPU; repeat test runs hit the cache
_CACHE = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
)
os.environ["GPZ_CACHE_DIR"] = _CACHE  # keep gpz_tpu.__init__ on the same dir
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
