"""Haseman-Elston regression and heritability estimation.

Reference: /root/reference/src/stats/he.rs (HE variance components with
PCG trace estimation, used as the fast VC pre-fit for GS) and
heritability.rs.

HE cross-product estimator: with centered phenotype residuals r,
minimize || r r' - σg² K - σe² I ||_F over the (K, I) basis — a 2x2
(or (k+1)x(k+1) for multiple kernels) normal-equation solve whose entries
are traces of kernel products.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class HeFit:
    vg: float
    ve: float
    h2: float
    se_h2: float | None = None


def he_regression(
    K: np.ndarray, y: np.ndarray, covariates: np.ndarray | None = None
) -> HeFit:
    y = np.asarray(y, np.float64).reshape(-1)
    n = len(y)
    X = np.ones((n, 1)) if covariates is None else np.concatenate(
        [np.ones((n, 1)), np.asarray(covariates, np.float64)], axis=1
    )
    # residualize
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    r = y - X @ beta
    K = np.asarray(K, np.float64)
    # normal equations over basis (K, I) using the off-diagonal + diagonal
    # moment identities: <rr', K>, <rr', I>, <K, K>, <K, I>, <I, I>
    Kr = K @ r
    a11 = float(np.sum(K * K))
    a12 = float(np.trace(K))
    a22 = float(n)
    b1 = float(r @ Kr)
    b2 = float(r @ r)
    A = np.array([[a11, a12], [a12, a22]])
    b = np.array([b1, b2])
    vg, ve = np.linalg.solve(A, b)
    vg = max(vg, 0.0)
    ve = max(ve, 1e-12)
    h2 = vg / (vg + ve) if vg + ve > 0 else 0.0
    return HeFit(vg=float(vg), ve=float(ve), h2=float(h2))


def reml_h2(K: np.ndarray, y: np.ndarray, covariates: np.ndarray | None = None):
    """Spectral REML heritability (exact single-kernel route)."""
    from janusx_tpu.core.reml import fit_null_reml, make_rotated, null_fit_stats
    from janusx_tpu.core.spectral import eigh_grm

    y = np.asarray(y, np.float64).reshape(-1)
    basis = eigh_grm(np.asarray(K, np.float64), diag_ridge=1e-6)
    rot = make_rotated(basis, y, covariates)
    null = fit_null_reml(rot)
    _, vg = null_fit_stats(rot, null.log10_lbd)
    ve = null.lbd * vg
    h2 = vg / (vg + ve) if vg + ve > 0 else 0.0
    return HeFit(vg=float(vg), ve=float(ve), h2=float(h2))
