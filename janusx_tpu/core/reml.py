"""Spectral-scale REML/ML machinery, batched over SNPs.

Re-derivation of the reference objectives
(/root/reference/src/stats/reml.rs: reml_loglike :255, ml_loglike :364,
final_beta_se :472, lmm_reml_null_f32 :572) in a TPU-native form: instead
of a per-SNP scalar loop, a whole SNP block evaluates one λ step together.

For eigenvalues s, rotated design Xr (n, p) (intercept included), rotated
phenotype yr and rotated SNP rows Gr (B, n), each λ evaluation needs only
weighted sums over the sample axis with weights w = 1/(s + λ_b). All
contractions are expressed as (B, n) @ (n, k) matmuls on the MXU:

    A_XX = w @ (X⊗X),  a_Xy = w @ (X*y),  a_yy = w @ y²      (shared pairs)
    a_Xg = (w*g) @ X,  a_gy = (w*g) @ y,  a_gg = Σ w g²      (per-SNP pairs)

followed by batched (p+1)x(p+1) Cholesky solves on device.

Objectives (profiled σ², exact match to the reference):
    REML = c_r - ½[(n-p')·ln(r'Wr) + ln|V| + ln|X'WX + ridge·I|]
    ML   = c_m - ½[ n    ·ln(r'Wr) + ln|V|]
with r'Wr = a_yy - 2β'b + β'A₀β, β from the ridged Gram (ridge 1e-6),
A₀ the unridged Gram, c_r = (n-p')(ln(n-p')-1-ln2π)/2, c_m analogous.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from janusx_tpu import config
from janusx_tpu.core.spectral import SpectralBasis
from janusx_tpu.ops.brent import brent_minimize_batched

_BAD = 1e8  # reference sentinel: invalid loglik = -1e8


class RotatedData(NamedTuple):
    """Device-resident rotated quantities (float64)."""

    s: jax.Array  # (n,)
    Xr: jax.Array  # (n, p)
    yr: jax.Array  # (n,)
    PXX: jax.Array  # (n, p*p) pairwise X products
    PXy: jax.Array  # (n, p)
    Pyy: jax.Array  # (n,)

    @property
    def n(self) -> int:
        return self.s.shape[0]

    @property
    def p(self) -> int:
        return self.Xr.shape[1]


def make_rotated(
    basis: SpectralBasis, y: np.ndarray, X_cov: np.ndarray | None
) -> RotatedData:
    """Rotate y and the design (intercept prepended) into the eigenbasis.

    Mirrors LMM.from_spectral (reference python/janusx/pyBLUP/assoc.py:1702):
    X_design = [1, X_cov].
    """
    n = basis.n
    ones = np.ones((n, 1), dtype=np.float64)
    X = ones if X_cov is None else np.concatenate([ones, np.asarray(X_cov, np.float64)], axis=1)
    Xr = basis.U.T @ X
    yr = basis.U.T @ np.asarray(y, np.float64).reshape(-1)
    PXX = (Xr[:, :, None] * Xr[:, None, :]).reshape(n, -1)
    PXy = Xr * yr[:, None]
    Pyy = yr * yr
    return RotatedData(
        s=jnp.asarray(basis.S, jnp.float64),
        Xr=jnp.asarray(Xr, jnp.float64),
        yr=jnp.asarray(yr, jnp.float64),
        PXX=jnp.asarray(PXX, jnp.float64),
        PXy=jnp.asarray(PXy, jnp.float64),
        Pyy=jnp.asarray(Pyy, jnp.float64),
    )


def _chol_pieces(M_ridged: jax.Array, rhs: jax.Array):
    """Batched Cholesky solve + logdet + (A^-1)_kk of the last index.

    M_ridged: (B, q, q); rhs: (B, q). Returns (beta, logdet, inv_kk, bad).
    """
    L = jnp.linalg.cholesky(M_ridged)
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    bad = jnp.any(~jnp.isfinite(diag) | (diag <= 0), axis=-1)
    Ls = jnp.where(bad[:, None, None], jnp.eye(L.shape[-1], dtype=L.dtype), L)
    z = jax.lax.linalg.triangular_solve(
        Ls, rhs[..., None], left_side=True, lower=True, transpose_a=False
    )
    beta = jax.lax.linalg.triangular_solve(
        Ls, z, left_side=True, lower=True, transpose_a=True
    )[..., 0]
    logdet = 2.0 * jnp.sum(jnp.log(jnp.where(bad[:, None], 1.0, diag)), axis=-1)
    # (A^-1)_kk for the last coordinate: || L^-1 e_k ||^2
    q = L.shape[-1]
    ek = jnp.zeros((q,), L.dtype).at[q - 1].set(1.0)
    ek = jnp.broadcast_to(ek, rhs.shape)
    zk = jax.lax.linalg.triangular_solve(
        Ls, ek[..., None], left_side=True, lower=True, transpose_a=False
    )[..., 0]
    inv_kk = jnp.sum(zk * zk, axis=-1)
    return beta, logdet, inv_kk, bad


def _snp_grams(log10_lbd: jax.Array, rot: RotatedData, Gr: jax.Array):
    """Weighted Gram pieces for the per-SNP design [X, g].

    log10_lbd: (B,), Gr: (B, n) float64. Returns dict of batched pieces.
    """
    p = rot.p
    lbd = jnp.power(10.0, log10_lbd)
    v = rot.s[None, :] + lbd[:, None]  # (B, n)
    valid = jnp.all(v > 0, axis=-1) & jnp.isfinite(lbd) & (lbd > 0)
    vsafe = jnp.where(v > 0, v, 1.0)
    w = 1.0 / vsafe
    logdetV = jnp.sum(jnp.log(vsafe), axis=-1)
    hp = jax.lax.Precision.HIGHEST
    Axx = jnp.dot(w, rot.PXX, precision=hp).reshape(-1, p, p)
    axy = jnp.dot(w, rot.PXy, precision=hp)
    ayy = jnp.dot(w, rot.Pyy, precision=hp)
    wg = w * Gr
    axg = jnp.dot(wg, rot.Xr, precision=hp)
    agy = jnp.dot(wg, rot.yr, precision=hp)
    agg = jnp.sum(wg * Gr, axis=-1)
    top = jnp.concatenate([Axx, axg[:, :, None]], axis=2)  # (B, p, p+1)
    bot = jnp.concatenate([axg, agg[:, None]], axis=1)[:, None, :]
    M = jnp.concatenate([top, bot], axis=1)  # (B, p+1, p+1)
    rhs = jnp.concatenate([axy, agy[:, None]], axis=1)
    return M, rhs, ayy, logdetV, valid


def _quad_rtwr(M: jax.Array, rhs: jax.Array, ayy: jax.Array, beta: jax.Array):
    return (
        ayy
        - 2.0 * jnp.sum(beta * rhs, axis=-1)
        + jnp.einsum("bi,bij,bj->b", beta, M, beta)
    )


def neg_reml_snp_batch(log10_lbd: jax.Array, rot: RotatedData, Gr: jax.Array):
    """-REML(log10 λ) per SNP lane; invalid lanes return +1e8."""
    n, p = rot.n, rot.p
    p1 = p + 1
    M, rhs, ayy, logdetV, valid = _snp_grams(log10_lbd, rot, Gr)
    Mr = M + config.GRAM_RIDGE * jnp.eye(p1, dtype=M.dtype)
    beta, logdetA, _, badchol = _chol_pieces(Mr, rhs)
    rtwr = _quad_rtwr(M, rhs, ayy, beta)
    nf, pf = float(n), float(p1)
    c = (nf - pf) * (math.log(nf - pf) - 1.0 - math.log(2.0 * math.pi)) / 2.0
    total = (nf - pf) * jnp.log(rtwr) + logdetV + logdetA
    reml = c - 0.5 * total
    ok = valid & ~badchol & jnp.isfinite(reml) & (rtwr > 0)
    return jnp.where(ok, -reml, _BAD)


def ml_snp_batch(log10_lbd: jax.Array, rot: RotatedData, Gr: jax.Array):
    """ML loglik per SNP lane (for LMM2 LRT); invalid lanes -> -1e8."""
    n = rot.n
    M, rhs, ayy, logdetV, valid = _snp_grams(log10_lbd, rot, Gr)
    p1 = M.shape[-1]
    Mr = M + config.GRAM_RIDGE * jnp.eye(p1, dtype=M.dtype)
    beta, _, _, badchol = _chol_pieces(Mr, rhs)
    rtwr = _quad_rtwr(M, rhs, ayy, beta)
    nf = float(n)
    c = nf * (math.log(nf) - 1.0 - math.log(2.0 * math.pi)) / 2.0
    ml = c - 0.5 * (nf * jnp.log(rtwr) + logdetV)
    ok = valid & ~badchol & jnp.isfinite(ml) & (rtwr > 0)
    return jnp.where(ok, ml, -_BAD)


def beta_se_snp_batch(log10_lbd: jax.Array, rot: RotatedData, Gr: jax.Array):
    """Final (beta, se) of the SNP term at the per-lane optimum λ.

    Mirrors final_beta_se (reference src/stats/reml.rs:472): σ² from the
    profiled quadratic with dof n-p', var(β_k) = σ² (A_ridged^{-1})_kk.
    """
    n, p = rot.n, rot.p
    p1 = p + 1
    M, rhs, ayy, logdetV, valid = _snp_grams(log10_lbd, rot, Gr)
    Mr = M + config.GRAM_RIDGE * jnp.eye(p1, dtype=M.dtype)
    beta, _, inv_kk, badchol = _chol_pieces(Mr, rhs)
    rtwr = _quad_rtwr(M, rhs, ayy, beta)
    sigma2 = rtwr / (float(n) - float(p1))
    var_k = sigma2 * inv_kk
    ok = valid & ~badchol & (var_k > 0) & jnp.isfinite(var_k)
    b = jnp.where(ok, beta[:, -1], jnp.nan)
    se = jnp.where(ok, jnp.sqrt(jnp.where(ok, var_k, 1.0)), jnp.nan)
    return b, se


# --------------------------------------------------------------- null model
def _null_grams(log10_lbd: jax.Array, rot: RotatedData):
    p = rot.p
    lbd = jnp.power(10.0, log10_lbd)
    v = rot.s[None, :] + lbd[:, None]
    valid = jnp.all(v > 0, axis=-1) & jnp.isfinite(lbd) & (lbd > 0)
    vsafe = jnp.where(v > 0, v, 1.0)
    w = 1.0 / vsafe
    logdetV = jnp.sum(jnp.log(vsafe), axis=-1)
    hp = jax.lax.Precision.HIGHEST
    M = jnp.dot(w, rot.PXX, precision=hp).reshape(-1, p, p)
    rhs = jnp.dot(w, rot.PXy, precision=hp)
    ayy = jnp.dot(w, rot.Pyy, precision=hp)
    return M, rhs, ayy, logdetV, valid


def neg_reml_null(log10_lbd: jax.Array, rot: RotatedData):
    n, p = rot.n, rot.p
    M, rhs, ayy, logdetV, valid = _null_grams(log10_lbd, rot)
    Mr = M + config.GRAM_RIDGE * jnp.eye(p, dtype=M.dtype)
    beta, logdetA, _, badchol = _chol_pieces(Mr, rhs)
    rtwr = _quad_rtwr(M, rhs, ayy, beta)
    nf, pf = float(n), float(p)
    c = (nf - pf) * (math.log(nf - pf) - 1.0 - math.log(2.0 * math.pi)) / 2.0
    reml = c - 0.5 * ((nf - pf) * jnp.log(rtwr) + logdetV + logdetA)
    ok = valid & ~badchol & jnp.isfinite(reml) & (rtwr > 0)
    return jnp.where(ok, -reml, _BAD)


def ml_null(log10_lbd: jax.Array, rot: RotatedData):
    n = rot.n
    M, rhs, ayy, logdetV, valid = _null_grams(log10_lbd, rot)
    p = M.shape[-1]
    Mr = M + config.GRAM_RIDGE * jnp.eye(p, dtype=M.dtype)
    beta, _, _, badchol = _chol_pieces(Mr, rhs)
    rtwr = _quad_rtwr(M, rhs, ayy, beta)
    nf = float(n)
    c = nf * (math.log(nf) - 1.0 - math.log(2.0 * math.pi)) / 2.0
    ml = c - 0.5 * (nf * jnp.log(rtwr) + logdetV)
    ok = valid & ~badchol & jnp.isfinite(ml) & (rtwr > 0)
    return jnp.where(ok, ml, -_BAD)


class NullFit(NamedTuple):
    lbd: float  # λ at the REML optimum
    log10_lbd: float
    reml: float
    ml: float  # ML loglik evaluated at the REML-optimal λ


@partial(jax.jit, static_argnames=("low", "high", "tol", "max_iter"))
def _null_fit_device(rot: RotatedData, low: float, high: float, tol: float, max_iter: int):
    f = lambda x: neg_reml_null(x, rot)
    x, fx = brent_minimize_batched(f, low, high, tol, max_iter, batch_shape=(1,))
    ml = ml_null(x, rot)
    return x[0], -fx[0], ml[0]


def fit_null_reml(
    rot: RotatedData,
    low: float = config.LOG10_LAMBDA_LOW,
    high: float = config.LOG10_LAMBDA_HIGH,
    tol: float = config.NULL_BRENT_TOL,
    max_iter: int = config.NULL_BRENT_MAX_ITER,
) -> NullFit:
    """Null REML fit via Brent over log10 λ — reference lmm_reml_null_f32
    (src/stats/reml.rs:572; returns (λ, ml, reml))."""
    x, reml, ml = _null_fit_device(rot, low, high, tol, max_iter)
    x = float(x)
    return NullFit(lbd=10.0 ** x, log10_lbd=x, reml=float(reml), ml=float(ml))
