"""SparseLMM: sparse-GRM mixed-model scans for biobank-scale n.

Reference: /root/reference/src/stats/spgrm.rs (thresholded sparse GRM),
splmm.rs (exact scan), splmm_approx.rs (GRAMMAR-gamma residualized scan),
spreml.rs (sparse REML null fits).

GRAMMAR-gamma (``-splmm``, the default approx route — splmm_approx.rs:1-18):
    M_X = I - X(X'X)^-1 X';  y~ = M_X y;  V_λ = K_sparse + λI
    λ from REML-style fit of y~ under V_λ;  a = V_λ^-1 y~
    γ = mean over sampled null markers (χ² < 5) of (g~'V^-1 g~)/(g~'g~)
    β ≈ (g~'a)/(γ g~'g~);  se ≈ 1/sqrt(γ g~'g~);  χ² = (g~'a)²/(γ g~'g~)

TPU split: the sparse factorizations (SuperLU on CSC, the host-native
replacement for the reference's faer LLT) run on host — they are O(n)
with a sparse K — while the per-SNP scan is pure device matmuls (the same
residualized machinery as the LM scan: one pass over packed blocks).

Default sparse cutoff 0.05 (reference workflow.py:6701); negative cutoff
disables off-diagonal thresholding.
"""

from __future__ import annotations

from dataclasses import dataclass

from functools import partial

import jax
import numpy as np
import scipy.sparse
import scipy.sparse.linalg

from janusx_tpu import config
from janusx_tpu.core import stats as jstats
from janusx_tpu.io.packed import PackedGenotypes
from janusx_tpu.models.lm import design_matrix, _lm_step
from janusx_tpu.models.scan_common import ScanResult, finalize_invalid, iter_blocks
from janusx_tpu.ops import decode

import jax.numpy as jnp

DEFAULT_SPARSE_CUTOFF = 0.05
NULL_CHI2_CUTOFF = 5.0  # fastGWA-style null-marker filter
N_GAMMA_MARKERS = 500


@partial(jax.jit, static_argnames=("block", "n_rows"))
def _grm_rowband(packed, mean, inv_sd, row_lo: int, n_rows: int, block: int):
    """One row-band of the GRM: C[rows]^T-style partial — computed as
    (n_rows, n_pad) accumulation over SNP blocks without ever holding the
    dense (n, n) matrix (reference tiled builder, src/stats/spgrm.rs:33-45).
    """
    nblk = packed.shape[0] // block
    pk = packed.reshape(nblk, block, packed.shape[1])
    mn = mean.reshape(nblk, block)
    iv = inv_sd.reshape(nblk, block)
    n_pad = packed.shape[1] * 4
    hp = jax.lax.Precision.HIGHEST

    def body(acc, xs):
        p, m, s = xs
        c = decode.decode_standardized(p, m, s, dtype=jnp.float32)  # (B, n_pad)
        rows = jax.lax.dynamic_slice(c, (0, row_lo), (c.shape[0], n_rows))
        acc = acc + jnp.dot(rows.T, c, precision=hp)
        return acc, None

    acc0 = jnp.zeros((n_rows, n_pad), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (pk, mn, iv))
    return acc


def build_sparse_grm(
    pg,
    cutoff: float = DEFAULT_SPARSE_CUTOFF,
    method: int = 1,
    row_band: int = 4096,
    block: int = config.DEFAULT_SNP_BLOCK,
) -> scipy.sparse.csr_matrix:
    """Thresholded sparse GRM built band-by-band — memory O(row_band x n)
    instead of O(n²), for biobank n (reference spgrm tile pipeline).

    Diagonal entries always kept; off-diagonals kept when |K_ij| >= cutoff
    (negative cutoff keeps everything — then prefer the dense builder).
    """
    from janusx_tpu.models.grm import _snp_scales
    from janusx_tpu.utils import devcache

    mean, inv_sd, var = _snp_scales(pg, method)
    n = pg.n_samples
    m = pg.m
    block = min(block, m)
    m_pad = -(-m // block) * block
    # band must be a lane multiple AND divide n_pad so every row-band slice
    # is a full in-bounds dynamic_slice (pad lanes decode to zero)
    band = max(128, (min(row_band, n) // 128) * 128)
    pk = devcache.device_packed(pg, m_pad, lane_align=band)
    mn = devcache.to_device_padded_rows(
        mean.astype(np.float32), m_pad, 0.0, dtype=jnp.float32
    )
    iv = devcache.to_device_padded_rows(
        inv_sd.astype(np.float32), m_pad, 0.0, dtype=jnp.float32
    )
    denom = float(var.sum()) if method in (1, 3) else float(m)
    parts = []
    for lo in range(0, n, band):
        n_rows = band
        tile = np.asarray(_grm_rowband(pk, mn, iv, lo, n_rows, block), np.float64)
        tile = tile[: max(0, min(band, n - lo)), :n] / denom
        if cutoff >= 0:
            mask = np.abs(tile) >= cutoff
            rr = np.arange(lo, lo + tile.shape[0])
            mask[np.arange(tile.shape[0]), rr] = True  # keep diagonal
            tile = np.where(mask, tile, 0.0)
        parts.append(scipy.sparse.csr_matrix(tile))
    K = scipy.sparse.vstack(parts).tocsr()
    return K


def sparsify_grm(K: np.ndarray, cutoff: float = DEFAULT_SPARSE_CUTOFF):
    """Threshold off-diagonals (keep |K_ij| >= cutoff); diagonal always kept.

    Negative cutoff keeps everything (reference rule)."""
    K = np.asarray(K, np.float64)
    if cutoff < 0:
        return scipy.sparse.csc_matrix(K)
    mask = np.abs(K) >= cutoff
    np.fill_diagonal(mask, True)
    return scipy.sparse.csc_matrix(np.where(mask, K, 0.0))


@dataclass
class SparseNullFit:
    lbd: float
    sigma2: float
    loglik: float
    factor: object  # splu of (K + lbd I)


def _neg_profiled_loglik(log10_lbd, Ks, ytilde, n_eff):
    lbd = 10.0 ** log10_lbd
    n = Ks.shape[0]
    V = (Ks + lbd * scipy.sparse.identity(n, format="csc")).tocsc()
    try:
        lu = scipy.sparse.linalg.splu(V)
    except RuntimeError:
        return 1e8, None
    diagU = lu.U.diagonal()
    if np.any(diagU <= 0):
        # LU of SPD should have positive pivots up to permutation sign
        logdet = float(np.sum(np.log(np.abs(diagU))))
    else:
        logdet = float(np.sum(np.log(diagU)))
    a = lu.solve(ytilde)
    quad = float(ytilde @ a)
    if quad <= 0:
        return 1e8, None
    nll = n_eff * np.log(quad) + logdet
    return 0.5 * nll, lu


def fit_sparse_null(
    Ks: scipy.sparse.csc_matrix,
    ytilde: np.ndarray,
    n_eff: int,
    low: float = config.LOG10_LAMBDA_LOW,
    high: float = config.LOG10_LAMBDA_HIGH,
    tol: float = 1e-4,
    max_iter: int = 40,
) -> SparseNullFit:
    """Profiled-variance null fit of the residualized phenotype by golden
    section over log10 λ (host; each eval is one sparse factorization)."""
    import scipy.optimize

    res = scipy.optimize.minimize_scalar(
        lambda lg: _neg_profiled_loglik(lg, Ks, ytilde, n_eff)[0],
        bounds=(low, high),
        method="bounded",
        options={"xatol": tol, "maxiter": max_iter},
    )
    nll, lu = _neg_profiled_loglik(res.x, Ks, ytilde, n_eff)
    lbd = 10.0 ** res.x
    a = lu.solve(ytilde)
    sigma2 = float(ytilde @ a) / n_eff
    return SparseNullFit(lbd=lbd, sigma2=sigma2, loglik=-nll, factor=lu)


def splmm_grammar_scan(
    pg: PackedGenotypes,
    K: np.ndarray,
    y: np.ndarray,
    covariates: np.ndarray | None = None,
    cutoff: float = DEFAULT_SPARSE_CUTOFF,
    block: int = config.DEFAULT_SNP_BLOCK,
    seed: int = 0,
) -> tuple[ScanResult, dict]:
    """GRAMMAR-gamma approximate scan (the ``-splmm`` route)."""
    y = np.asarray(y, np.float64).reshape(-1)
    n = pg.n
    X = design_matrix(n, covariates)
    p = X.shape[1]
    C = np.linalg.inv(X.T @ X)
    proj = lambda v: v - X @ (C @ (X.T @ v))
    ytilde = proj(y)
    n_eff = n - p

    Ks = sparsify_grm(K, cutoff)
    null = fit_sparse_null(Ks, ytilde, n_eff)
    a = null.factor.solve(ytilde) / null.sigma2

    # gamma calibration on sampled markers (host decode of a small subset)
    rng = np.random.default_rng(seed)
    m = pg.m
    n_samp = min(N_GAMMA_MARKERS, m)
    samp = np.sort(rng.choice(m, size=n_samp, replace=False))
    gammas = []
    for i in samp:
        g = pg.centered(i, i + 1)[0]
        gt = proj(g)
        gg = float(gt @ gt)
        if gg <= 1e-12:
            continue
        vg = null.factor.solve(gt)
        gPg = float(gt @ vg) / null.sigma2
        ga = float(gt @ a)
        chi2 = ga * ga / gPg if gPg > 0 else np.inf
        if chi2 < NULL_CHI2_CUTOFF:
            gammas.append(gPg / gg * null.sigma2)
    gamma = float(np.mean(gammas)) if gammas else 1.0
    gamma_eff = gamma / null.sigma2

    # device scan: g~'a and g~'g~ via the residualized LM machinery
    Ma = proj(a)  # so that G @ Ma = g~' a
    Xd = jnp.asarray(X)
    Cd = jnp.asarray(C)
    Mad = jnp.asarray(Ma)
    packed = decode.pad_packed_cols(pg.packed)
    beta = np.empty(m)
    se = np.empty(m)
    gMg_all = np.empty(m)
    block = min(block, m)
    for s0, e0 in iter_blocks(m, block):
        from janusx_tpu.models.scan_common import pad_rows

        pk = pad_rows(packed[s0:e0], block, 0xFF)
        mn = pad_rows(pg.mean[s0:e0].astype(np.float32), block)
        gA, gMg = _lm_step(jnp.asarray(pk), jnp.asarray(mn), Xd, Cd, Mad, n)
        gA = np.asarray(gA)[: e0 - s0]
        gMgb = np.asarray(gMg)[: e0 - s0]
        with np.errstate(divide="ignore", invalid="ignore"):
            beta[s0:e0] = gA / (gamma_eff * gMgb)
            se[s0:e0] = 1.0 / np.sqrt(gamma_eff * gMgb)
        gMg_all[s0:e0] = gMgb

    pwald = jstats.pwald_from_beta_se(beta, se)
    beta, se, pwald, _ = finalize_invalid(beta, se, pwald, gMg_all)
    info = {
        "lambda_null": null.lbd,
        "sigma2": null.sigma2,
        "gamma": gamma,
        "nnz_frac": Ks.nnz / (n * n),
        "n_gamma_markers": len(gammas),
    }
    res = ScanResult(
        sites=pg.sites, af=pg.af, miss=pg.miss, beta=beta, se=se, pwald=pwald,
        extras=info,
    )
    return res, info
