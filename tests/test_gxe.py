"""G-by-E interaction scan tests."""

import numpy as np
import pytest

from janusx_tpu.io.gdata import GenotypeData, SiteInfo
from janusx_tpu.io.packed import QcParams, pack_genotypes
from janusx_tpu.models.gxe import gxe_scan
from janusx_tpu.models.grm import grm_from_packed
from janusx_tpu.core.spectral import eigh_grm


@pytest.fixture(scope="module")
def gxe_problem():
    rng = np.random.default_rng(41)
    m, n = 250, 300
    p = rng.uniform(0.15, 0.5, size=m)
    g = rng.binomial(2, p[:, None], size=(m, n)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object), pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object), allele1=np.array(["G"] * m, object),
    )
    pg = pack_genotypes(
        GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object)),
        QcParams(maf=0.05, geno=0.1),
    )
    env = rng.normal(size=n)
    Z = pg.centered()
    # SNP 30: pure interaction effect; SNP 90: main effect only
    y = Z[30] * env * 0.8 + Z[90] * 0.6 + rng.normal(size=n) * 0.8
    return pg, y, env


def test_lm2_interaction_detection(gxe_problem):
    pg, y, env = gxe_problem
    res, _ = gxe_scan(pg, y, env, block=64)
    # reference lm2 layout: base columns = SNP main effect; interaction
    # stats in the appended columns (glm2.rs lm2_header)
    lp_main = -np.log10(res.pwald)
    assert np.argmax(lp_main) == 90  # main-effect SNP tops the main test
    lp_int = -np.log10(res.extra_cols["pwald_i1"])
    assert np.argmax(lp_int) == 30  # interaction SNP tops the interaction test
    assert lp_int[90] < 3.0 < lp_int[30]
    # joint 2-df test catches both
    jl = -np.log10(res.extra_cols["p_joint"])
    assert jl[30] > 3 and jl[90] > 3
    # interaction-joint equals the single-interaction Wald chisq at K=1
    assert res.extra_cols["chisq_int_joint"][30] == pytest.approx(
        (res.extra_cols["beta_i1"][30] / res.extra_cols["se_i1"][30]) ** 2,
        rel=1e-8,
    )


def test_lm2_matches_numpy_ols(gxe_problem):
    pg, y, env = gxe_problem
    res, _ = gxe_scan(pg, y, env, block=64)
    import scipy.stats

    # reference convention: the interaction covariate enters RAW (glm2.rs:216)
    Z = pg.centered()
    n = pg.n
    for i in (5, 30, 90, 200):
        g = Z[i]
        X = np.column_stack([np.ones(n), env, g, g * env])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        r = y - X @ beta
        df = n - X.shape[1]
        s2 = r @ r / df
        cov = s2 * np.linalg.inv(X.T @ X)
        t = beta[3] / np.sqrt(cov[3, 3])
        pexp = 2 * scipy.stats.t.sf(abs(t), df)
        assert res.extra_cols["beta_i1"][i] == pytest.approx(
            beta[3], rel=2e-2, abs=1e-4
        )
        lp_o = -np.log10(res.extra_cols["pwald_i1"][i])
        lp_e = -np.log10(pexp)
        assert lp_o == pytest.approx(lp_e, abs=0.3)
        # SNP main-effect column matches the OLS g coefficient
        assert res.beta[i] == pytest.approx(beta[2], rel=2e-2, abs=1e-4)


def test_lm2_raw_covariate_convention(gxe_problem):
    """A mean-shifted covariate must enter the interaction RAW (glm2.rs:216):
    beta_g picks up the bi*mean(c) reparameterization a centered product
    would hide."""
    pg, y, env = gxe_problem
    import scipy.stats

    env2 = env + 3.0
    res, _ = gxe_scan(pg, y, env2, block=64)
    Z = pg.centered()
    n = pg.n
    for i in (30, 90):
        g = Z[i]
        X = np.column_stack([np.ones(n), env2, g, g * env2])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        r = y - X @ beta
        df = n - X.shape[1]
        s2 = r @ r / df
        cov = s2 * np.linalg.inv(X.T @ X)
        assert res.beta[i] == pytest.approx(beta[2], rel=2e-2, abs=1e-4)
        assert res.extra_cols["beta_i1"][i] == pytest.approx(
            beta[3], rel=2e-2, abs=1e-4
        )
        t = beta[3] / np.sqrt(cov[3, 3])
        pexp = 2 * scipy.stats.t.sf(abs(t), df)
        assert -np.log10(res.extra_cols["pwald_i1"][i]) == pytest.approx(
            -np.log10(pexp), abs=0.3
        )


def test_fvlmm2_route(gxe_problem):
    pg, y, env = gxe_problem
    K = grm_from_packed(pg)
    basis = eigh_grm(K, diag_ridge=1e-6)
    res, null = gxe_scan(pg, y, env, basis=basis, block=64)
    assert null is not None and null.lbd > 0
    lp = -np.log10(res.extra_cols["pwald_i1"])
    assert np.argmax(lp) == 30
