"""Prediction: predictive mean + full uncertainty decomposition.

The reference implements 2 families x 4 regimes = 8 code paths
(ref GPz/predictDiag.m:58-296, GPz/predictCov.m:53-337: predictFull /
predictNoisy / predictMissing / predictNoisyMissing). Here each family has ONE
unified moment-matching implementation: input noise psi == 0 and an all-True
mask reduce it exactly to the clean case, so {noisy, missing, noisy+missing,
clean} are the same code. A cheap fast path (`predict_clean`) covers the
clean case in O(n m) instead of O(n m^2).

Outputs per sample (ref demo_sinc.m:105-109, predict.m:72):
  mu      point estimate
  nu      model ("density") variance      diag(E[phi] Sigma_w^-1 E[phi]^T)-ish
  beta_i  noise variance                  exp(E ln S) (1 + V ln S / 2)
  gamma   input-noise/missing propagation Var[phi^T w]
  sigma = nu + beta_i + gamma

All rows of one call share a single missingness pattern (a (d,) mask vector):
the host-side driver in gpz_tpu.model groups rows by pattern exactly like ref
GPz/predict.m:45-56 and dispatches each group here.

Precision. The moment-matched second moments are tiny differences of large
sums: nu = sum_ij E[phi_i phi_j] (Sigma_w^-1)_ij can be ~1e-6 while
sum_ij |.| is ~10 (measured on the trained photo-z model, round 4), so f32
*values* of the pair densities put an absolute noise floor of ~1e-4 under
nu/gamma — which inflates sigma on exactly the most confident rows and
costs ~0.4 nats of test MLL vs the reference's f64 pipeline (the round-3
parity violation). The fix exploits what the TPU is good at: the
ELEMENTWISE chain (quadratic forms, logdets, exp) runs in float64 — which
XLA:TPU emulates accurately (~1e-14, PRECISION.md §3) — while the
CONTRACTIONS against w/v/iSigma_w stay on the f32 MXU: with f64-accurate
pair densities, an f32-grade contraction only contributes
~eps_f32 * sum|terms| ~ 1e-6, two orders below what the band needs.
Env GPZ_VARIANCE_DTYPE=float32 restores the all-f32 fast path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from gpz_tpu.config import ModelConfig
from gpz_tpu.params import GPzParams
from gpz_tpu.phi import design_matrix
from gpz_tpu.linalg import (
    safe_cholesky,
    chol_logdet,
    chol_solve,
    masked_psd,
    quad_logdet_psd,
    unrolled_inv_psd,
)


def _v_or_zero(params: GPzParams, cfg: ModelConfig):
    if params.v is not None:
        return params.v
    return jnp.zeros((cfg.m, cfg.k), dtype=params.P.dtype)


def _log_priors(priors):
    """log prior with a floor at the dtype's tiny.

    The EM fixed point (ref getPrior.m) legitimately collapses most bases
    to prior ~0 on trained models; in f32 those underflow to exactly 0 and
    log gives -inf. A -inf logit is harmless in softmax unless a row has
    no finite entry at all, so floor at tiny (log ~ -87/-708) to keep the
    responsibilities defined everywhere."""
    tiny = jnp.finfo(priors.dtype).tiny
    return jnp.log(jnp.maximum(priors, tiny))


#: element budget for the pair-pass intermediates (env GPZ_PAIR_BUDGET).
#: The O(n m^2) moment-matching pass is tiled over blocks of basis index i so
#: the peak live intermediate is (n, B, m, d_cost) elements with
#: B ~= budget / (n m d_cost) — prediction at m=1000 never materializes the
#: full (n, m, m, ...) pair tensor (VERDICT r1 items 6-7; the reference's
#: equivalent loops are predictDiag.m:93-121 / predictCov.m:95-129,180-218).
PAIR_BUDGET = int(os.environ.get("GPZ_PAIR_BUDGET", str(3 * 10**7)))

#: tighter element budget for the full-covariance MISSING path: its mixture
#: scans (phi_step / ec_step over m components) run inside the blocked pair
#: pass, and large per-step (n, B, m, d, d) temporaries crash the TPU worker
#: with a kernel fault (bisected on-chip at m=1000: 115 MB temps fault;
#: 40 MB and 12 MB run clean, at identical wall clock — the path is
#: scan-bound, so the conservative cap costs nothing. VERDICT r2 weak #6 /
#: BASELINE configs[4]). The complete path tolerates the larger default.
MISSING_PAIR_BUDGET = int(
    os.environ.get("GPZ_PAIR_BUDGET_MISSING", str(3 * 10**6))
)

#: mixture-truncation width for the full-covariance missing-data path (env
#: GPZ_MIX_TOPL): the GMM-conditioning mixture sums (phi_step / ec_step,
#: ref predictCov.m:197-202,301-306) scan over all m components although the
#: posterior responsibilities Pio are a softmax whose mass concentrates on a
#: handful of bases on trained models. Keeping each row's top-L components
#: (renormalized) cuts the scans from m to L steps — the dominant cost of
#: missing-data prediction at m=1000 (19 rows/s in round 3, VERDICT item 6).
#: L >= m disables truncation exactly. Truncation is GUARDED, not blind
#: (ADVICE r4 #1: with flat responsibilities — untrained models, rows with
#: few observed dims — the dropped mass is unbounded): predict_moments_full
#: reports the minimum per-row top-L softmax mass, and the model.predict
#: driver re-runs a batch with the exact full sum whenever coverage falls
#: below MIX_COVERAGE_MIN.
MIX_TOPL = int(os.environ.get("GPZ_MIX_TOPL", "64"))

#: minimum per-row top-L responsibility mass below which the driver escalates
#: a truncated batch to the exact mixture (dropped mass <= 1 - this, i.e.
#: ~1e-6 relative on every mixture sum — below the chain's other floors)
MIX_COVERAGE_MIN = float(os.environ.get("GPZ_MIX_COVERAGE_MIN", "0.999999"))


def variance_dtype():
    """dtype of the moment-matching chain (see module docstring): float64
    unless GPZ_VARIANCE_DTYPE=float32 opts into the all-f32 fast path."""
    return jnp.dtype(os.environ.get("GPZ_VARIANCE_DTYPE", "float64"))


def mix_dtype():
    """dtype of the GMM-conditioning mixture scans in the full-covariance
    MISSING path (env GPZ_MIX_DTYPE, default float32).

    The missing path's cost is its per-component scans — L sequential
    (n, B, m, d, d) Cholesky/quad/exp chains (phi_step / ec_step). Run in
    emulated f64 on TPU they measure 16 rows/s at m=1000; in f32,
    167 rows/s (round-5 sweep). f32 is sound HERE even though the pair
    pass needs f64 (module docstring): the mixture sums are NONNEGATIVE —
    sum_l Pio_l N_l has no cancellation, so per-component f32 relative
    error (~1e-6) passes through linearly instead of being amplified, and
    the pair tables (lnZij, lnNo) that DO feed cancellation-sensitive
    contractions stay in variance_dtype. Set GPZ_MIX_DTYPE=float64 to
    restore the all-f64 chain (NB at m=1000 the f64 EXACT-mixture scan
    has produced TPU worker kernel faults; the f32 scan runs clean)."""
    return jnp.dtype(os.environ.get("GPZ_MIX_DTYPE", "float32"))


def _block_size(n: int, m: int, d_cost: int, budget: int = 0,
                itemsize: int = 4) -> int:
    # budgets are calibrated in f32 elements; scale down for wider dtypes
    # so the peak live BYTES stay constant
    budget = (budget or PAIR_BUDGET) * 4 // itemsize
    return max(1, min(m, budget // max(1, n * m * d_cost)))


def _blocked_sum(body, nb: int, B: int, init):
    """sum_{i-blocks} body(i0) via lax.scan (one traced block program)."""
    if nb == 1:
        return body(jnp.asarray(0, jnp.int32))

    def step(acc, i0):
        out = body(i0)
        return jax.tree.map(jnp.add, acc, out), None

    offsets = (jnp.arange(nb) * B).astype(jnp.int32)
    acc, _ = jax.lax.scan(step, init, offsets)
    return acc


def predict_clean(params, post, cfg: ModelConfig, X, mask, psi=None,
                  complete=True):
    """Fast path — ref predictFull (predictDiag.m:58-74).

    Also used with psi for the reference's predictNoisy *mean* when only mu is
    needed. Returns (mu, nu, beta_i, gamma, PHI).
    """
    PHI, _, ln_beta = design_matrix(params, cfg, X, mask, psi, complete)
    mu = PHI @ post.w
    # nu_k = diag(PHI iSigma_w_k PHI^T)
    nu = jnp.einsum("nm,kmj,nj->nk", PHI, post.iSigma_w, PHI)
    beta_i = jnp.exp(ln_beta)
    gamma = jnp.zeros_like(mu)
    return mu, nu, beta_i, gamma, PHI


# --------------------------------------------------------------------------
# diagonal family: one unified moment-matching path
# --------------------------------------------------------------------------

def predict_moments_diag(params, post, priors, cfg: ModelConfig, X,
                         mask_vec, psi, complete: bool):
    """Unified noisy/missing moment-matched prediction, diagonal family.

    Equivalent to ref predictDiag.m predictNoisy (75-125), predictMissing
    (127-209) and predictNoisyMissing (211-296) — and reduces exactly to
    predictFull when psi == 0 and mask_vec is all-True.

    X:        (n, d) zero-filled rows sharing one missingness pattern
    mask_vec: (d,) observed indicator for the whole group
    psi:      (n, d) input-noise variances (zeros when none)
    complete: static — True when mask_vec is statically all-True (skips the
              GMM-conditioning machinery)
    """
    vdt = variance_dtype()                    # density-chain dtype (f64)
    cdt = params.P.dtype                      # MXU contraction dtype (f32)
    up = lambda a: a.astype(vdt)
    P = up(params.P)                          # (m, d)
    G = up(params.expand_gamma(cfg))
    Sigma = G**-2.0                           # (m, d)
    iS = G**2.0
    w = post.w.astype(cdt)                    # (m, k)
    v = _v_or_zero(params, cfg).astype(cdt)
    b = up(params.b)
    X = up(X)
    psi = up(psi)
    priors = up(priors)
    om = mask_vec.astype(vdt)                 # (d,)
    um = 1.0 - om

    # --- responsibilities + expected activations (PHI) ---
    SP = psi[:, None, :] + Sigma[None, :, :]               # (n, m, d)
    Delta = X[:, None, :] - P[None, :, :]
    # multiply+sum, not einsum: tiny-axis contractions compile
    # pathologically on XLA:TPU (see phi.py)
    lnNo = jnp.sum(
        (-0.5 * Delta**2 / SP - 0.5 * jnp.log(SP)) * om[None, None, :],
        axis=-1,
    )                                                      # (n, m)
    lnz = 0.5 * jnp.sum(jnp.log(Sigma), axis=1)            # (m,)

    if complete:
        PHI = jnp.exp(lnz[None, :] + lnNo)
        Pio = None
    else:
        logits = lnNo + _log_priors(priors)[None, :]
        Pio = jax.nn.softmax(logits, axis=1)               # (n, m)
        # Nij over unobserved dims (predictDiag.m:160)
        Sij = Sigma[:, None, :] + Sigma[None, :, :]        # (m, m, d)
        dP = P[:, None, :] - P[None, :, :]
        lnNij_u = jnp.sum(
            (-0.5 * dP**2 / Sij - 0.5 * jnp.log(Sij)) * um[None, None, :],
            axis=-1,
        )
        # nonnegative contraction — no cancellation, so the cdt MXU dot
        # keeps full relative accuracy on the vdt-accurate factors
        PHI = jnp.exp(lnz)[None, :] * jnp.exp(lnNo) * (
            Pio.astype(cdt) @ jnp.exp(lnNij_u).astype(cdt)
        ).astype(vdt)

    PHI_c = PHI.astype(cdt)
    mu = (PHI_c @ w).astype(vdt)                           # (n, k)
    ElnS = (PHI_c @ v).astype(vdt)

    # --- pairwise moment matching (predictDiag.m:93-121), tiled over blocks
    # of the first basis index i so the peak intermediate is (n, B, m, d)
    # elements regardless of m (see PAIR_BUDGET) ---
    n, d = X.shape
    m, k = cfg.m, cfg.k
    B = _block_size(n, m, d, itemsize=vdt.itemsize)
    nb = -(-m // B)
    pad = nb * B - m
    # i-side arrays padded so partial blocks contribute exactly zero: padded
    # w/v/iSigma_w rows are zero (kills the contractions); padded Sigma/iS
    # are 1 and P/lnz are 0 so every padded pair density stays finite.
    P_i = jnp.pad(P, ((0, pad), (0, 0)))
    iS_i = jnp.pad(iS, ((0, pad), (0, 0)), constant_values=1.0)
    Sig_i = jnp.pad(Sigma, ((0, pad), (0, 0)), constant_values=1.0)
    lnz_i = jnp.pad(lnz, (0, pad))
    w_i = jnp.pad(w, ((0, pad), (0, 0)))
    v_i = jnp.pad(v, ((0, pad), (0, 0)))
    iSW_i = jnp.pad(post.iSigma_w.astype(cdt), ((0, 0), (0, pad), (0, 0)))
    Pio_l = None if complete else jnp.pad(Pio, ((0, 0), (0, pad)))

    def pair_block(i0):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i0, B, 0)
        Pb, iSb, Sb, lzb, wb, vb = (
            sl(P_i), sl(iS_i), sl(Sig_i), sl(lnz_i), sl(w_i), sl(v_i)
        )
        iSWb = jax.lax.dynamic_slice_in_dim(iSW_i, i0, B, 1)   # (k, B, m)
        iCij = iSb[:, None, :] + iS[None, :, :]                # (B, m, d)
        Cij = 1.0 / iCij
        cij = (Pb[:, None, :] * iSb[:, None, :]
               + P[None, :, :] * iS[None, :, :]) * Cij
        Sij = Sb[:, None, :] + Sigma[None, :, :]
        dP = Pb[:, None, :] - P[None, :, :]
        lnZij = (
            lzb[:, None] + lnz[None, :]
            - 0.5 * jnp.sum(dP**2 / Sij + jnp.log(Sij), axis=-1)
        )                                                      # (B, m)
        CP = Cij[None] + psi[:, None, None, :]                 # (n, B, m, d)
        dxc = X[:, None, None, :] - cij[None]
        lnNo_pair = jnp.sum(
            (-0.5 * dxc**2 / CP - 0.5 * jnp.log(CP)) * om[None, None, None, :],
            axis=-1,
        )
        if complete:
            Ec = jnp.exp(lnNo_pair)
        else:
            # GMM expectation over unobserved dims (predictDiag.m:181-186),
            # chunked over mixture components l with the same block size so
            # the n-independent (l, B, m, d) table is bounded too
            def l_block(l0):
                Slb = jax.lax.dynamic_slice_in_dim(Sig_i, l0, B, 0)
                Plb = jax.lax.dynamic_slice_in_dim(P_i, l0, B, 0)
                SC = Slb[:, None, None, :] + Cij[None]         # (B, B, m, d)
                dPc = Plb[:, None, None, :] - cij[None]
                lnNu = jnp.sum(
                    (-0.5 * dPc**2 / SC - 0.5 * jnp.log(SC))
                    * um[None, None, None, :],
                    axis=-1,
                )
                Piob = jax.lax.dynamic_slice_in_dim(Pio_l, l0, B, 1)
                # nonnegative mixture sum: cdt MXU contraction is safe
                return (jnp.einsum(
                    "nl,lij->nij", Piob.astype(cdt),
                    jnp.exp(lnNu).astype(cdt)),)
            (mix,) = _blocked_sum(
                l_block, nb, B, (jnp.zeros((n, B, m), cdt),)
            )
            Ec = jnp.exp(lnNo_pair) * mix.astype(vdt)
        # contractions on the cdt MXU: the pair densities are vdt-accurate,
        # so the f32-grade dots only add ~eps_f32 * sum|terms| (~1e-6)
        ZN = (jnp.exp(lnZij)[None] * Ec).astype(cdt)           # (n, B, m)
        g_c = jnp.einsum("nij,ik,jk->nk", ZN, wb, w)
        V_c = jnp.einsum("nij,ik,jk->nk", ZN, vb, v)
        nu_c = jnp.einsum("nij,kij->nk", ZN, iSWb)
        return g_c.astype(vdt), V_c.astype(vdt), nu_c.astype(vdt)

    zero = jnp.zeros((n, k), vdt)
    g_sum, V_sum, nu = _blocked_sum(pair_block, nb, B, (zero, zero, zero))
    gamma = g_sum - mu**2
    VlnS = V_sum - ElnS**2

    ElnS_b = ElnS + b[None, :]
    beta_i = jnp.exp(ElnS_b) * (1.0 + 0.5 * VlnS)
    return mu, nu, beta_i, gamma, PHI


# --------------------------------------------------------------------------
# full-covariance family
# --------------------------------------------------------------------------

def predict_moments_full(params, post, priors, cfg: ModelConfig, X,
                         mask_vec, psi, complete: bool,
                         mix_topl: int = None, return_coverage: bool = False):
    """Unified moment-matched prediction, full-covariance family (GC/VC).

    Equivalent to ref predictCov.m predictNoisy (70-133), predictMissing
    (134-232) and predictNoisyMissing (233-337). The conditional-imputation
    objects of the missing paths (R, X_hat, Psi_hat; predictCov.m:159-175,
    268-277) are built with masked dense algebra:
        J_i     = Sigma_i A_i^-1 M          (the unshuffled [I; R'] map)
        X_hat_i = P_i + J_i (x - P_i)
        Psi_hat_i = J_i Psi J_i^T + Sigma_i - J_i Sigma_i
    which reduce to X_hat = x, Psi_hat = Psi when nothing is missing.

    psi: (n, d, d) (zeros when none).
    mix_topl: static mixture-truncation width (None -> module MIX_TOPL).
    return_coverage: append the minimum per-row top-L responsibility mass
    (1.0 when no truncation applies) so the driver can detect flat
    responsibilities and escalate to the exact sum (see MIX_COVERAGE_MIN).
    """
    n, d = X.shape
    m, k = cfg.m, cfg.k
    vdt = variance_dtype()                    # density-chain dtype (f64)
    cdt = params.P.dtype                      # MXU contraction dtype (f32)
    up = lambda a: a.astype(vdt)
    P = up(params.P)
    G = up(params.expand_gamma(cfg))          # (m, d, d)
    w = post.w.astype(cdt)
    v = _v_or_zero(params, cfg).astype(cdt)
    b = up(params.b)
    X = up(X)
    psi = up(psi)
    priors = up(priors)
    om = mask_vec.astype(vdt)
    M = jnp.diag(om)                          # (d, d)
    eye = jnp.eye(d, dtype=vdt)

    # all batched tiny (d x d) factorizations below use the unrolled VPU
    # path (linalg.unrolled_*): lax.linalg lowering on TPU is both slow and
    # HBM-hungry at these shapes
    iSig = jnp.einsum("mij,mik->mjk", G, G)   # (m, d, d)
    Sigma, logdet_iSig = unrolled_inv_psd(iSig)
    lnz = -0.5 * logdet_iSig                  # = +0.5 logdet Sigma, (m,)

    Delta = X[:, None, :] - P[None, :, :]     # (n, m, d)
    Dm = Delta * om[None, None, :]

    # responsibilities: N(x_o; P_o, (Sigma + Psi)_oo) (predictCov.m:167,266);
    # the masked embedding's identity block contributes zero to the logdet
    SPoo = masked_psd(
        Sigma[None] + psi[:, None], mask_vec.astype(bool)[None, None, :]
    )
    quad_No, ld_No = quad_logdet_psd(SPoo, Dm)
    lnNo = -0.5 * quad_No - 0.5 * ld_No       # (n, m)

    if complete:
        Pio = None
        X_hat = jnp.broadcast_to(X[:, None, :], (n, m, d))
        Psi_hat = jnp.broadcast_to(psi[:, None], (n, m, d, d))
        PHI = jnp.exp(lnz)[None, :] * jnp.exp(lnNo)
        coverage = jnp.ones((), X.dtype)
    else:
        logits = lnNo + _log_priors(priors)[None, :]
        Pio = jax.nn.softmax(logits, axis=1)                   # (n, m)

        # conditional imputation per basis (predictCov.m:169-174), in
        # PRECISION form: the covariance form cond_cov = Sigma - J Sigma
        # is a catastrophic cancellation at trained models' covariance
        # scales (Sigma eigenvalues ~1e9 in f32 -> indefinite cond_cov,
        # NaN logdets downstream). Instead
        #   cond_cov = inv(iSig_uu)  (embedded on the unobserved block)
        #   J = M - cond_cov iSig M  (so J_oo = I,
        #                             J_uo = -inv(iSig_uu) iSig_uo
        #                                  = Sigma_uo Sigma_oo^-1)
        # -- same math, no subtraction of large equals, PSD by construction.
        um = 1.0 - om
        Buu = masked_psd(
            iSig, jnp.broadcast_to(~mask_vec.astype(bool), (m, d))
        )
        Binv, _ = unrolled_inv_psd(Buu)
        cond_cov = Binv * (um[None, :, None] * um[None, None, :])
        J = M[None] - (
            jnp.einsum("mij,mjk->mik", cond_cov, iSig) * om[None, None, :]
        )
        X_hat = P[None, :, :] + jnp.einsum("mij,nmj->nmi", J, Delta)
        Psi_hat = (
            jnp.einsum("mij,njk,mlk->nmil", J, psi, J) + cond_cov[None]
        )                                                          # (n, m, d, d)

        # mixture truncation (see MIX_TOPL): keep each row's top-L
        # responsibilities, renormalized so the conditional mixture still
        # integrates to 1; L >= m reduces to the exact full sum (top_k of
        # all m is a permutation and the renormalizer is sum(softmax) == 1)
        L = min(m, MIX_TOPL if mix_topl is None else int(mix_topl))
        if L < m:
            pio_t, idx = jax.lax.top_k(Pio, L)                     # (n, L)
            coverage = jnp.min(jnp.sum(pio_t, axis=1))
            pio_t = pio_t / jnp.sum(pio_t, axis=1, keepdims=True)
            Xh_t = jnp.take_along_axis(X_hat, idx[:, :, None], axis=1)
            Ph_t = jnp.take_along_axis(
                Psi_hat, idx[:, :, None, None], axis=1
            )
        else:
            pio_t, Xh_t, Ph_t = Pio, X_hat, Psi_hat
            coverage = jnp.ones((), X.dtype)

        # PHI_i = exp(lnz_i) sum_j Pio_j N(X_hat_j; P_i, Sigma_i + Psi_hat_j),
        # as a scan over mixture components j so the peak intermediate is
        # (n, m, d, d) — never the (n, m, m, d, d) tensor (VERDICT r1 item 7).
        # The scans run in mix_dtype (f32): the sums are nonnegative, so
        # per-component f32 error passes through linearly — and the
        # emulated-f64 version of these chains was 10x slower AND kernel-
        # faulted the TPU worker at the m=1000 exact mixture (see mix_dtype)
        mdt = mix_dtype()
        mix_xs = (
            jnp.moveaxis(Ph_t, 1, 0).astype(mdt),                  # (L, n, d, d)
            jnp.moveaxis(Xh_t, 1, 0).astype(mdt),                  # (L, n, d)
            pio_t.T.astype(mdt),                                   # (L, n)
        )
        Sigma_m = Sigma.astype(mdt)
        P_m = P.astype(mdt)

        def phi_step(acc, xs):
            Ph_l, Xh_l, Pio_l = xs
            SPH = Sigma_m[None] + Ph_l[:, None]                    # (n, m, d, d)
            dXh = Xh_l[:, None, :] - P_m[None]
            quad_f, ld_f = quad_logdet_psd(SPH, dXh)
            return acc + Pio_l[:, None] * jnp.exp(-0.5 * quad_f - 0.5 * ld_f), None

        phi_sum, _ = jax.lax.scan(
            phi_step, jnp.zeros((n, m), mdt), mix_xs
        )
        PHI = jnp.exp(lnz)[None, :] * phi_sum.astype(X.dtype)

    PHI_c = PHI.astype(cdt)
    mu = (PHI_c @ w).astype(vdt)
    ElnS = (PHI_c @ v).astype(vdt)

    # --- pairwise pass (predictCov.m:101-113,180-218), tiled over blocks of
    # basis index i; the mixture sum of the missing path runs as a scan over
    # components l so the reference's (n, l, i, j, d, d) triple-loop tensor
    # never materializes — peak live block is (n, B, m, d, d) elements ---
    # multiply+sum, not einsum: keeps the vdt table on the accurate
    # elementwise path (the TPU backend's f64 dot is f32-grade)
    PiS = jnp.sum(P[:, :, None] * iSig, axis=1)             # (m, d)
    B = _block_size(n, m, d * d,
                    0 if complete else MISSING_PAIR_BUDGET,
                    itemsize=vdt.itemsize)
    nb = -(-m // B)
    pad = nb * B - m
    eye_pad = jnp.broadcast_to(eye, (pad, d, d))
    P_i = jnp.pad(P, ((0, pad), (0, 0)))
    PiS_i = jnp.pad(PiS, ((0, pad), (0, 0)))
    iSig_i = jnp.concatenate([iSig, eye_pad], axis=0)
    Sig_i = jnp.concatenate([Sigma, eye_pad], axis=0)
    lnz_i = jnp.pad(lnz, (0, pad))
    w_i = jnp.pad(w, ((0, pad), (0, 0)))
    v_i = jnp.pad(v, ((0, pad), (0, 0)))
    iSW_i = jnp.pad(post.iSigma_w.astype(cdt), ((0, 0), (0, pad), (0, 0)))

    def pair_block(i0):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i0, B, 0)
        Pb, PiSb, iSigb, Sigb, lzb, wb, vb = (
            sl(P_i), sl(PiS_i), sl(iSig_i), sl(Sig_i), sl(lnz_i),
            sl(w_i), sl(v_i),
        )
        iSWb = jax.lax.dynamic_slice_in_dim(iSW_i, i0, B, 1)   # (k, B, m)
        iCij = iSigb[:, None] + iSig[None, :]                  # (B, m, d, d)
        Cij, _ = unrolled_inv_psd(iCij)
        # multiply+sum (see PiS note)
        cij = jnp.sum(
            (jnp.broadcast_to(PiSb[:, None, :], (B, m, d))
             + PiS[None, :, :])[..., :, None] * Cij,
            axis=-2,
        )
        SS = Sigb[:, None] + Sigma[None, :]                    # (B, m, d, d)
        dP = Pb[:, None, :] - P[None, :, :]
        quad_p, ld_p = quad_logdet_psd(SS, dP)
        lnZij = lzb[:, None] + lnz[None, :] - 0.5 * quad_p - 0.5 * ld_p

        if complete:
            CP = Cij[None] + psi[:, None, None]                # (n, B, m, d, d)
            dxc = X[:, None, None, :] - cij[None]
            quad_c, ld_c = quad_logdet_psd(CP, dxc)
            Ec = jnp.exp(-0.5 * quad_c - 0.5 * ld_c)
        else:
            # mixture sum over l (predictCov.m:197-202,301-306), in
            # mix_dtype like the PHI mixture above (nonnegative sum; the
            # cancellation-sensitive pair table lnZij stays in vdt)
            mdt = mix_dtype()
            Cij_m = Cij.astype(mdt)
            cij_m = cij.astype(mdt)

            def ec_step(acc, xs):
                Ph_l, Xh_l, Pio_l = xs
                CPl = Cij_m[None] + Ph_l[:, None, None]        # (n, B, m, d, d)
                dxc = Xh_l[:, None, None, :] - cij_m[None]
                quad_c, ld_c = quad_logdet_psd(CPl, dxc)
                return acc + Pio_l[:, None, None] * jnp.exp(
                    -0.5 * quad_c - 0.5 * ld_c
                ), None

            Ec, _ = jax.lax.scan(
                ec_step, jnp.zeros((n, B, m), mdt), mix_xs
            )
            Ec = Ec.astype(X.dtype)

        # contractions on the cdt MXU: the pair densities are vdt-accurate,
        # so the f32-grade dots only add ~eps_f32 * sum|terms| (~1e-6)
        ZN = (jnp.exp(lnZij)[None] * Ec).astype(cdt)           # (n, B, m)
        g_c = jnp.einsum("nij,ik,jk->nk", ZN, wb, w)
        V_c = jnp.einsum("nij,ik,jk->nk", ZN, vb, v)
        nu_c = jnp.einsum("nij,kij->nk", ZN, iSWb)
        return g_c.astype(vdt), V_c.astype(vdt), nu_c.astype(vdt)

    zero = jnp.zeros((n, k), vdt)
    g_sum, V_sum, nu = _blocked_sum(pair_block, nb, B, (zero, zero, zero))
    gamma = g_sum - mu**2
    VlnS = V_sum - ElnS**2

    ElnS_b = ElnS + b[None, :]
    beta_i = jnp.exp(ElnS_b) * (1.0 + 0.5 * VlnS)
    if return_coverage:
        return mu, nu, beta_i, gamma, PHI, coverage
    return mu, nu, beta_i, gamma, PHI
