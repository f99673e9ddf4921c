"""FvLMM: fixed-λ mixed-model scan (EMMAX-style, ``-fvlmm``).

One REML null fit gives λ for the whole GWAS; each SNP is then a weighted
regression on the rotated scale (reference /root/reference/src/stats/
fvlmm.rs:1-8):

    beta = (g'P y)/(g'P g),  se = sqrt((y'P y / df)/(g'P g)),  df = n-p-1
    P = W - W X (X'WX)^{-1} X'W,  W = diag(1/(s_i + λ))
    pwald = 2*Phi_bar(|beta/se|)  (fvlmm.rs:1774-1778)

Device step: decode block -> rotate via U (f32 MXU matmul) -> two small
matmuls against precomputed P-pieces. Everything after rotation is f64.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from janusx_tpu import config
from janusx_tpu.core import stats as jstats
from janusx_tpu.core.reml import NullFit, fit_null_reml, make_rotated
from janusx_tpu.core.spectral import SpectralBasis
from janusx_tpu.io.packed import PackedGenotypes
from janusx_tpu.models.scan_common import ScanResult, finalize_invalid, iter_blocks, pad_rows
from janusx_tpu.ops import decode


@partial(jax.jit, static_argnames=("n",))
def _fvlmm_block(packed, mean, U32, w, X, Cw, Py, n: int):
    """gPy, gPg, ssq for one padded block.

    w: (n,) weights; X: (n, p) rotated design; Cw = (X'WX + ridge)^{-1};
    Py: (n,) = P y.
    """
    Graw = decode.decode_centered(packed, mean, dtype=jnp.float32)[:, :n]
    Gr = jnp.dot(Graw, U32, precision=jax.lax.Precision.HIGHEST).astype(jnp.float64)
    hp = jax.lax.Precision.HIGHEST
    ssq = jnp.sum(Gr * Gr, axis=-1)
    wG = Gr * w[None, :]
    gPy = jnp.dot(Gr, Py, precision=hp)
    XWg = jnp.dot(wG, X, precision=hp)  # (B, p) = g'WX
    gWg = jnp.sum(wG * Gr, axis=-1)
    gPg = gWg - jnp.einsum("bp,pq,bq->b", XWg, Cw, XWg)
    return gPy, gPg, ssq


def fvlmm_scan(
    pg: PackedGenotypes,
    basis: SpectralBasis,
    y: np.ndarray,
    covariates: np.ndarray | None = None,
    block: int = config.DEFAULT_SNP_BLOCK,
    null: NullFit | None = None,
) -> tuple[ScanResult, NullFit]:
    """Fixed-λ scan. ``basis`` must be the eigh of the (ridged) GRM on the
    same sample subset as ``pg``."""
    y = np.asarray(y, np.float64).reshape(-1)
    n = pg.n
    rot = make_rotated(basis, y, covariates)
    if null is None:
        null = fit_null_reml(rot)
    p = rot.p
    df = n - p - 1
    if df <= 0:
        raise ValueError("df <= 0 in fvlmm scan")

    s = basis.S
    w = 1.0 / (s + null.lbd)
    Xr = np.asarray(rot.Xr)
    yr = np.asarray(rot.yr)
    XWX = Xr.T * w @ Xr + config.GRAM_RIDGE * np.eye(p)
    Cw = np.linalg.inv(XWX)
    XWy = Xr.T @ (w * yr)
    Py = w * yr - (w[:, None] * Xr) @ (Cw @ XWy)
    yPy = float(yr @ Py)

    U32 = jnp.asarray(basis.U, jnp.float32)
    wd = jnp.asarray(w)
    Xd = jnp.asarray(Xr)
    Cwd = jnp.asarray(Cw)
    Pyd = jnp.asarray(Py)
    packed = decode.pad_packed_cols(pg.packed)
    m = pg.m
    beta = np.empty(m)
    se = np.empty(m)
    ssq_all = np.empty(m)
    for s0, e0 in iter_blocks(m, block):
        pk = pad_rows(packed[s0:e0], block, 0xFF)
        mn = pad_rows(pg.mean[s0:e0].astype(np.float32), block)
        gPy, gPg, ssq = _fvlmm_block(
            jnp.asarray(pk), jnp.asarray(mn), U32, wd, Xd, Cwd, Pyd, n
        )
        gPy = np.asarray(gPy)[: e0 - s0]
        gPg = np.asarray(gPg)[: e0 - s0]
        with np.errstate(divide="ignore", invalid="ignore"):
            beta[s0:e0] = gPy / gPg
            se[s0:e0] = np.sqrt((yPy / df) / gPg)
        ssq_all[s0:e0] = np.asarray(ssq)[: e0 - s0]

    pwald = jstats.pwald_from_beta_se(beta, se)
    beta, se, pwald, _ = finalize_invalid(beta, se, pwald, ssq_all)
    res = ScanResult(
        sites=pg.sites, af=pg.af, miss=pg.miss, beta=beta, se=se, pwald=pwald,
        extras={"lambda_null": null.lbd, "reml_null": null.reml},
    )
    return res, null
