import time, numpy as np
import gpz_tpu
t0=time.time()
rng = np.random.default_rng(0)
n, d = 20000, 5
from gpz_tpu.data import synthetic_sdss
mags, errs, z = synthetic_sdss(n=n, seed=0)
psi = errs**2
tr, va, te = gpz_tpu.datautils.split(n, 0.5, 0.2, 0.3, rng)
model = gpz_tpu.init(mags, z, "VC", 50, training=tr, psi=psi, seed=0, dtype="float32")
print("init", round(time.time()-t0,1), flush=True)
t0=time.time()
model = gpz_tpu.train(model, mags, z, training=tr, validation=va, psi=psi,
                      max_iter=100, max_attempts=25, verbose=False)
print("train", round(time.time()-t0,1), "s; iters", model.fit_info["iterations"],
      "best", round(model.best.score,4), flush=True)
t0=time.time()
pred = gpz_tpu.predict(mags, model, psi=psi, selection=te)
err = z[te]-pred.mu[:,0]
print("predict", round(time.time()-t0,1), "s; RMSE", round(float(np.sqrt(np.mean(err**2))),4),
      "std(z)", round(float(np.std(z[te])),4), flush=True)
