"""Bayes A / B / Cπ marker-effect models — device-resident Gibbs sampler.

Model and priors follow the reference (/root/reference/src/stats/bayes.rs
doc + BGLR-style hyperparameter defaults: r2=0.5, df0_b=5, df0_e=5,
prob_in=0.5, counts=10):

    y = 1μ + Z a + e,  e ~ N(0, σe² I),  Z standardized (n, m)
    BayesA  : a_j ~ N(0, σ_j²),  σ_j² ~ scaled-inv-χ²(df0_b, S0_b)
    BayesB  : δ_j ~ Bern(π) spike-and-slab over the BayesA hierarchy
    BayesCπ : shared slab variance, π ~ Beta-Binomial posterior

TPU mapping: the per-marker Gibbs sweep is inherently sequential, so it
runs as ONE ``lax.scan`` over marker rows inside a ``lax.fori_loop`` over
iterations — the entire MCMC is a single device dispatch; each scan step
is an O(n) dot/axpy on the VPU. Replaces the reference's rayon/BLAS
streamed sweep (bayes.rs bayesb_core_impl).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _chi2(key, df, shape=(), dtype=jnp.float32):
    return 2.0 * jax.random.gamma(key, df / 2.0, shape=shape, dtype=dtype)


@partial(
    jax.jit,
    static_argnames=("n_iter", "burnin", "thin", "method"),
)
def _gibbs(
    Zt,  # (m, n) f32 standardized marker rows
    y,  # (n,) f64
    key,
    n_iter: int,
    burnin: int,
    thin: int,
    method: str,  # "A" | "B" | "Cpi"
    r2=0.5,
    df0_b=5.0,
    df0_e=5.0,
    prob_in=0.5,
    counts=10.0,
):
    m, n = Zt.shape
    f = jnp.float32
    y32 = y.astype(f)
    x2 = jnp.sum(Zt * Zt, axis=1)  # (m,)
    mean_x = jnp.mean(Zt, axis=1)
    msx = jnp.sum(x2) / n - jnp.sum(mean_x * mean_x)
    var_y = jnp.var(y32, ddof=1)
    prob_eff = 1.0 if method == "A" else prob_in
    s0_b = var_y * r2 / msx * (df0_b + 2.0) / prob_eff
    var_e0 = var_y * (1.0 - r2)
    s0_e = var_e0 * (df0_e + 2.0)
    counts_in = prob_in * counts
    counts_out = counts - counts_in

    mu0 = jnp.mean(y32)
    beta0 = jnp.zeros((m,), f)
    var_b0 = jnp.full((m,), s0_b / (df0_b + 2.0), f)
    delta0 = jnp.ones((m,), f) if method == "A" else jnp.full((m,), prob_in, f) > jax.random.uniform(key, (m,), dtype=f)
    delta0 = delta0.astype(f) if method != "A" else jnp.ones((m,), f)
    r0 = y32 - mu0

    def marker_step(carry, xs):
        r, var_e, var_slab, pi, key = carry
        z, x2j, bj, vbj, dj = xs
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        vb_eff = vbj if method in ("A", "B") else var_slab
        # full conditional for a_j given inclusion
        rhs = jnp.dot(z, r, precision=jax.lax.Precision.HIGHEST) + x2j * bj
        C = x2j / var_e + 1.0 / vb_eff
        mean = rhs / var_e / C
        var = 1.0 / C
        if method == "A":
            d_new = jnp.asarray(1.0, f)
        else:
            # log Bayes factor for inclusion (integrating a_j)
            logbf = 0.5 * (mean * mean / var + jnp.log(var) - jnp.log(vb_eff))
            logit = jnp.log(pi) - jnp.log1p(-pi) + logbf
            p_in = jax.nn.sigmoid(logit)
            d_new = (jax.random.uniform(k3, dtype=f) < p_in).astype(f)
        b_new = jnp.where(
            d_new > 0, mean + jnp.sqrt(var) * jax.random.normal(k1, dtype=f), 0.0
        )
        r = r - z * (b_new - bj)
        # per-marker variance update (BayesA/B hierarchy)
        vb_new = jnp.where(
            d_new > 0,
            (s0_b + b_new * b_new) / _chi2(k2, df0_b + 1.0),
            s0_b / _chi2(k4, df0_b),
        ).astype(f)
        b_new = b_new.astype(f)
        return (r, var_e, var_slab, pi, key), (b_new, vb_new, d_new)

    def iter_body(it, state):
        mu, r, beta, var_b, delta, var_e, var_slab, pi, key, acc_b, acc_mu, n_acc = state
        key, km, ks, ke, kp, kc = jax.random.split(key, 6)
        # intercept
        r_mu = r + mu
        mu_new = (jnp.mean(r_mu) + jax.random.normal(km, dtype=f) * jnp.sqrt(var_e / n)).astype(f)
        r = r_mu - mu_new
        # marker sweep
        (r, _, _, _, _), (beta, var_b, delta) = jax.lax.scan(
            marker_step,
            (r, var_e, var_slab, pi, ks),
            (Zt, x2, beta, var_b, delta),
        )
        # residual variance
        sse = jnp.dot(r, r, precision=jax.lax.Precision.HIGHEST)
        var_e = ((sse + s0_e) / _chi2(ke, n + df0_e)).astype(f)
        # Cpi: shared slab variance + pi update
        n_active = jnp.sum(delta)
        if method == "Cpi":
            ssb = jnp.sum(beta * beta)
            var_slab = ((ssb + s0_b) / _chi2(kc, df0_b + n_active)).astype(f)
            pi = jax.random.beta(kp, counts_in + n_active, counts_out + m - n_active, dtype=f)
            pi = jnp.clip(pi, 1e-6, 1.0 - 1e-6)
        elif method == "B":
            pi = jax.random.beta(kp, counts_in + n_active, counts_out + m - n_active, dtype=f)
            pi = jnp.clip(pi, 1e-6, 1.0 - 1e-6)
        # accumulate posterior means
        take = (it >= burnin) & (((it - burnin) % thin) == 0)
        acc_b = acc_b + jnp.where(take, beta, 0.0)
        acc_mu = acc_mu + jnp.where(take, mu_new, 0.0)
        n_acc = n_acc + jnp.where(take, 1, 0)
        return (mu_new, r, beta, var_b, delta, var_e, var_slab, pi, key,
                acc_b, acc_mu, n_acc)

    state0 = (
        mu0, r0, beta0, var_b0, delta0, jnp.asarray(var_e0, f),
        jnp.asarray(s0_b / (df0_b + 2.0), f),
        jnp.asarray(prob_in, f), key,
        jnp.zeros((m,), f), jnp.asarray(0.0, f), jnp.asarray(0, jnp.int32),
    )
    out = jax.lax.fori_loop(0, n_iter, iter_body, state0)
    acc_b, acc_mu, n_acc = out[9], out[10], out[11]
    denom = jnp.maximum(n_acc, 1).astype(f)
    return acc_b / denom, acc_mu / denom


def bayes_fit(
    Z: np.ndarray,  # (n, m) standardized sample-major
    y: np.ndarray,
    method: str,  # "BayesA" | "BayesB" | "BayesCpi"
    n_iter: int = 400,
    burnin: int = 200,
    thin: int = 1,
    seed: int = 0,
):
    """Returns (marker_effects (m,), mu)."""
    tag = {"BayesA": "A", "BayesB": "B", "BayesCpi": "Cpi"}[method]
    Zt = jnp.asarray(np.ascontiguousarray(Z.T), jnp.float32)
    beta, mu = _gibbs(
        Zt,
        jnp.asarray(y, jnp.float64),
        jax.random.PRNGKey(seed),
        n_iter,
        burnin,
        thin,
        tag,
    )
    return np.asarray(beta, np.float64), float(mu)


def bayes_fit_predict(cfg, method, Xml, y, train, test, kf):
    """GS-workflow adapter: CV + final fit + test prediction."""
    from janusx_tpu.gs.metrics import regression_metrics

    fold_metrics = []
    for fold, (tr_loc, va_loc) in enumerate(kf.split(len(train))):
        t0 = time.monotonic()
        beta, mu = bayes_fit(
            Xml[train[tr_loc]], y[train[tr_loc]], method,
            cfg.bayes_iters, cfg.bayes_burnin, cfg.bayes_thin, cfg.seed + fold,
        )
        pv = mu + Xml[train[va_loc]] @ beta
        mets = regression_metrics(y[train[va_loc]], pv)
        mets.update(fold=fold, elapsed_sec=round(time.monotonic() - t0, 3))
        fold_metrics.append(mets)
    t1 = time.monotonic()
    beta, mu = bayes_fit(
        Xml[train], y[train], method,
        cfg.bayes_iters, cfg.bayes_burnin, cfg.bayes_thin, cfg.seed,
    )
    test_pred = mu + Xml[test] @ beta if len(test) else np.empty(0)
    info = {"fit_seconds": time.monotonic() - t1, "mu": mu}
    return test_pred, fold_metrics, info
