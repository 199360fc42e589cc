import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from gpz_tpu.ops.vc_phi import vc_lnphi_complete
from gpz_tpu.linalg import quad_logdet_psd

rng = np.random.default_rng(0)
n, d, m = 100_000, 5, 100
dt = np.float32
X = jnp.asarray(rng.standard_normal((n, d)).astype(dt))
psi = np.zeros((n, d, d), dt); psi[:, np.arange(d), np.arange(d)] = 0.1
psi = jnp.asarray(psi)
P = jnp.asarray(rng.standard_normal((m, d)).astype(dt))
B = rng.standard_normal((m, d, d)).astype(dt)*0.2
Sigma = jnp.asarray(B @ np.swapaxes(B,1,2) + 0.5*np.eye(d, dtype=dt))
logdet = jnp.asarray(np.linalg.slogdet(np.asarray(Sigma))[1].astype(dt))

def ref(X, psi, P, Sigma, logdet):
    A = psi[:, None] + Sigma[None]
    delta = X[:, None, :] - P[None, :, :]
    quad, ld = quad_logdet_psd(A, delta)
    return -0.5*quad + 0.5*logdet[None,:] - 0.5*ld

ITERS = 10
def loop_bench(name, fn_one):
    t0 = time.perf_counter()
    @jax.jit
    def run(P, X, psi):
        def body(i, acc):
            return acc + fn_one(P + acc * 1e-30, X, psi)
        return jax.lax.fori_loop(0, ITERS, body, 0.0)
    _ = float(run(P, X, psi))
    print(name, "compiled in", round(time.perf_counter()-t0,1), "s", flush=True)
    t0 = time.perf_counter()
    _ = float(run(P, X, psi))
    print(f"{name}: {(time.perf_counter() - t0) / ITERS * 1e3:.3f} ms/eval", flush=True)

loop_bench("pallas fwd", lambda P, X, psi: vc_lnphi_complete(X, psi, P, Sigma, logdet).sum())
loop_bench("jnp    fwd", lambda P, X, psi: ref(X, psi, P, Sigma, logdet).sum())
loop_bench("pallas fwd+bwd", lambda P, X, psi: jax.grad(lambda q: vc_lnphi_complete(X, psi, q, Sigma, logdet).sum())(P).sum())
loop_bench("jnp    fwd+bwd", lambda P, X, psi: jax.grad(lambda q: ref(X, psi, q, Sigma, logdet).sum())(P).sum())
g1 = jax.jit(jax.grad(lambda q: vc_lnphi_complete(X, psi, q, Sigma, logdet).sum()))(P)
g2 = jax.jit(jax.grad(lambda q: ref(X, psi, q, Sigma, logdet).sum()))(P)
print("grad dP rel diff:", float(jnp.max(jnp.abs(g1-g2))/(jnp.max(jnp.abs(g2))+1e-30)), flush=True)
