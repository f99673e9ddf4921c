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


def test_combo_joint_gls_matches_numpy():
    """_joint_chunk algebra vs a direct numpy weighted GLS."""
    import numpy as np

    from janusx_tpu.models.combo import _joint_chunk

    rng = np.random.default_rng(4)
    n, p, B = 80, 2, 5
    Xr = np.column_stack([np.ones(n), rng.normal(size=n)])
    w = rng.uniform(0.5, 2.0, n)
    yr = rng.normal(size=n)
    G3 = rng.normal(size=(B, 3, n))
    out = np.asarray(_joint_chunk(G3, Xr, yr, w, n, p))
    for b in range(B):
        D = np.column_stack([Xr, G3[b].T])  # (n, p+3)
        A = D.T @ (D * w[:, None])
        Ar = A + 1e-6 * np.eye(p + 3)
        beta = np.linalg.solve(Ar, D.T @ (w * yr))
        r = yr - D @ beta
        sigma2 = np.sum(w * r * r) / (n - p - 3)
        se = np.sqrt(sigma2 * np.diag(np.linalg.inv(Ar)))[p:]
        np.testing.assert_allclose(out[b, 0::3], beta[p:], rtol=1e-8)
        np.testing.assert_allclose(out[b, 1::3], se, rtol=1e-8)
        from scipy import stats as sp

        pz = 2 * sp.norm.sf(np.abs(beta[p:] / se))
        np.testing.assert_allclose(out[b, 2::3], pz, rtol=1e-6)


def test_combo_literal_and_xor_tables():
    """literalize/xor_dual reproduce the reference hardcall tables."""
    import numpy as np

    from janusx_tpu.models.combo import literalize, xor_dual

    g = np.array([[0.0, 0.6, 1.4, 2.0, 1.0]])
    np.testing.assert_array_equal(literalize(g, [False]),
                                  [[0, 1, 1, 2, 1]])
    np.testing.assert_array_equal(literalize(g, [True]),
                                  [[2, 1, 1, 0, 1]])
    a = np.array([[0, 0, 0, 1, 1, 2, 2, 1, 2]], float)
    b = np.array([[0, 1, 2, 1, 2, 2, 0, 0, 1]], float)
    # same: hom->0, het->1; diff: has het->1 else 2
    np.testing.assert_array_equal(xor_dual(a, b),
                                  [[0, 1, 2, 1, 1, 0, 2, 1, 1]])


def test_fvlmm2_combo_cli(tmp_path):
    """`jx fvlmm2 -i pairs.txt`: planted AND interaction recovered,
    skip table written, compact reference schema emitted."""
    import numpy as np
    import pandas as pd

    from janusx_tpu.cli.fvlmm2 import main as fvlmm2_main
    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.models.sim import write_pheno

    rng = np.random.default_rng(11)
    m, n = 60, 400
    g = rng.binomial(2, 0.45, size=(m, n)).astype(np.int8)
    lit = np.minimum(g[10], g[40]).astype(float)  # AND hardcall combo
    y = 1.5 * lit + rng.normal(size=n)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=(np.arange(m, dtype=np.int64) + 1) * 1000,
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )
    prefix = str(tmp_path / "cb")
    plink.write_plink_genotypes(
        prefix,
        GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object)))
    write_pheno(prefix + ".pheno", [f"i{j}" for j in range(n)], y[:, None])
    pairs = tmp_path / "pairs.txt"
    pairs.write_text(
        "s10&s40\n"
        "s5|s7\n"
        "!s3&s4\n"
        "s1*s2\n"
        "1:11000^s40\n"      # chrom:pos token spelling
        "# comment\n"
        "s10&&s40\n"          # invalid expression -> skipped
        "nosuch&s1\n"         # unknown token -> skipped
        "!s1*s2\n")           # negated multiplicative -> skipped
    rc = fvlmm2_main([
        "-bfile", prefix, "-p", prefix + ".pheno", "-i", str(pairs),
        "-maf", "0.0", "-geno", "1.0",
        "-o", str(tmp_path), "-prefix", "fx",
    ])
    assert rc == 0
    df = pd.read_csv(tmp_path / "fx.trait0.fvlmm2.tsv", sep="\t")
    assert list(df.columns) == [
        "chrom", "pos", "combo_id", "combo_af", "unit_name",
        "beta_combo_joint", "se_combo_joint", "p_combo_joint",
        "p_combo_joint_fdr", "p_lit1_joint", "p_lit2_joint"]
    assert len(df) == 5
    top = df.loc[df["p_combo_joint"].idxmin()]
    assert top["combo_id"] == "s10&s40"
    assert top["p_combo_joint"] < 1e-6
    assert (df["p_combo_joint_fdr"].dropna() <= 1.0).all()
    # combos not touching the causal pair stay null (the XOR row shares
    # s10/s40 and legitimately carries signal, so it is excluded)
    null_rows = df[df["combo_id"].isin(["s5|s7", "!s3&s4", "s1*s2"])]
    assert (null_rows["p_combo_joint"] > 1e-4).all()
    skip = pd.read_csv(tmp_path / "fx.fvlmm2.skip", sep="\t")
    assert len(skip) == 3
    assert set(skip["reason"]).issuperset({"invalid_expression"})
