"""REML core tests vs an independent (slow, direct) numpy implementation."""

import numpy as np
import pytest
import scipy.optimize

import jax
import jax.numpy as jnp

from janusx_tpu import config
from janusx_tpu.core.reml import (
    NullFit,
    beta_se_snp_batch,
    fit_null_reml,
    make_rotated,
    ml_snp_batch,
    neg_reml_snp_batch,
)
from janusx_tpu.core.spectral import SpectralBasis, eigh_grm
from janusx_tpu.ops.brent import brent_minimize_batched


def np_reml(log10_lbd, s, X, y, g=None):
    """Direct numpy REML loglik on the spectral scale (independent impl)."""
    lbd = 10.0 ** log10_lbd
    D = [X] if g is None else [X, g[:, None]]
    Xd = np.concatenate(D, axis=1)
    n, p = Xd.shape
    v = s + lbd
    if np.any(v <= 0):
        return -1e8
    w = 1.0 / v
    A0 = Xd.T * w @ Xd
    A = A0 + config.GRAM_RIDGE * np.eye(p)
    b = Xd.T @ (w * y)
    beta = np.linalg.solve(A, b)
    r = y - Xd @ beta
    rtwr = float(w @ (r * r))
    logdetV = float(np.log(v).sum())
    sign, logdetA = np.linalg.slogdet(A)
    c = (n - p) * (np.log(n - p) - 1 - np.log(2 * np.pi)) / 2
    return c - 0.5 * ((n - p) * np.log(rtwr) + logdetV + logdetA)


def np_beta_se(log10_lbd, s, X, y, g):
    lbd = 10.0 ** log10_lbd
    Xd = np.concatenate([X, g[:, None]], axis=1)
    n, p = Xd.shape
    w = 1.0 / (s + lbd)
    A = Xd.T * w @ Xd + config.GRAM_RIDGE * np.eye(p)
    b = Xd.T @ (w * y)
    beta = np.linalg.solve(A, b)
    r = y - Xd @ beta
    sigma2 = float(w @ (r * r)) / (n - p)
    var = sigma2 * np.linalg.inv(A)[-1, -1]
    return beta[-1], np.sqrt(var)


@pytest.fixture
def spectral_problem(rng):
    n, m = 150, 40
    G = rng.binomial(2, rng.uniform(0.1, 0.5, size=(m * 4, 1)), size=(m * 4, n)).astype(float)
    Gc = G - G.mean(1, keepdims=True)
    K = Gc.T @ Gc / (m * 4)
    basis = eigh_grm(K, diag_ridge=1e-6)
    cov = rng.normal(size=(n, 2))
    u = basis.U @ (rng.normal(size=n) * np.sqrt(np.maximum(basis.S, 0)))
    y = 0.5 + cov @ [0.2, -0.1] + u + rng.normal(size=n)
    Gsnp = G[:m]
    rot = make_rotated(basis, y, cov)
    Gr = jnp.asarray(Gsnp @ basis.U, jnp.float64)
    X_design = np.concatenate([np.ones((n, 1)), cov], axis=1)
    # make_rotated residualizes y against span(X) (exact REML/GLS
    # reparameterization; see core/reml.py). The independent numpy checks
    # must compare on the same parameterization: the reference-parity
    # 1e-6 ridge on X'V^-1 X makes the estimator translation-invariant
    # only to O(ridge), which a rel=1e-8/1e-9 cross-check can see.
    c, *_ = np.linalg.lstsq(X_design, y, rcond=None)
    y_res = y - X_design @ c
    return basis, rot, Gr, X_design, y_res, Gsnp


def test_reml_matches_numpy(spectral_problem):
    basis, rot, Gr, X, y, Gsnp = spectral_problem
    yr = basis.U.T @ y
    Xr = basis.U.T @ X
    f = jax.jit(neg_reml_snp_batch)
    for lg in (-2.0, 0.0, 1.5):
        lgs = jnp.full((Gr.shape[0],), lg, jnp.float64)
        ours = -np.asarray(f(lgs, rot, Gr))
        for b in range(0, Gr.shape[0], 7):
            expect = np_reml(lg, basis.S, Xr, yr, np.asarray(Gr[b]))
            assert ours[b] == pytest.approx(expect, rel=1e-9, abs=1e-7)


def test_beta_se_matches_numpy(spectral_problem):
    basis, rot, Gr, X, y, _ = spectral_problem
    yr = basis.U.T @ y
    Xr = basis.U.T @ X
    lgs = jnp.full((Gr.shape[0],), 0.3, jnp.float64)
    beta, se = jax.jit(beta_se_snp_batch)(lgs, rot, Gr)
    for b in range(0, Gr.shape[0], 5):
        eb, es = np_beta_se(0.3, basis.S, Xr, yr, np.asarray(Gr[b]))
        assert float(beta[b]) == pytest.approx(eb, rel=1e-8)
        assert float(se[b]) == pytest.approx(es, rel=1e-8)


def test_null_fit_matches_scipy(spectral_problem):
    basis, rot, Gr, X, y, _ = spectral_problem
    yr = basis.U.T @ y
    Xr = basis.U.T @ X
    fit = fit_null_reml(rot)
    res = scipy.optimize.minimize_scalar(
        lambda lg: -np_reml(lg, basis.S, Xr, yr),
        bounds=(-5, 5),
        method="bounded",
        options={"xatol": 1e-8},
    )
    # near the optimum the surface is flat; compare objective values and
    # allow argmin slack consistent with the curvature-limited resolution
    assert fit.log10_lbd == pytest.approx(res.x, abs=5e-3)
    assert fit.reml == pytest.approx(-res.fun, abs=1e-6)
    assert -np_reml(fit.log10_lbd, basis.S, Xr, yr) <= res.fun + 1e-6


def test_batched_brent_vs_scipy():
    # distinct quartic minima per lane
    centers = jnp.asarray([-3.0, -0.7, 0.0, 1.234, 4.2])

    def f(x):
        return (x - centers) ** 2 + 0.1 * (x - centers) ** 4

    x, fx = brent_minimize_batched(f, -5.0, 5.0, 1e-6, 100, batch_shape=(5,))
    np.testing.assert_allclose(np.asarray(x), np.asarray(centers), atol=1e-4)


def test_ml_loglik_shape(spectral_problem):
    basis, rot, Gr, X, y, _ = spectral_problem
    lgs = jnp.zeros((Gr.shape[0],), jnp.float64)
    ml = jax.jit(ml_snp_batch)(lgs, rot, Gr)
    assert ml.shape == (Gr.shape[0],)
    assert np.all(np.isfinite(np.asarray(ml)))
