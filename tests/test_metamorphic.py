"""Metamorphic invariance tests for the scan numerics.

Each test states a mathematical identity the production scans MUST
satisfy exactly (or to refinement tolerance) regardless of
implementation: permutation/affine/scale equivariances, duplicate-SNP
and block-layout consistency. These complement the golden TSVs (which
pin one dataset) by pinning *structural* properties on random data —
the class of bug they catch (padding leakage, block-boundary effects,
flip asymmetry, accidental scale dependence) is invisible to goldens.
"""

import numpy as np
import pytest

from janusx_tpu.core.spectral import eigh_grm
from janusx_tpu.io.gdata import GenotypeData, SiteInfo
from janusx_tpu.io.packed import QcParams, pack_genotypes
from janusx_tpu.models.grm import grm_from_packed
from janusx_tpu.models.lm import lm_scan
from janusx_tpu.models.lmm import lmm_scan

QC_OFF = QcParams(maf=0.0, geno=1.0, het=1.0)


def _sites(m: int) -> SiteInfo:
    return SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(m, dtype=np.int64) + 1,
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )


def _panel(rng, m=700, n=220, h2=0.4):
    """Random panel + structured phenotype (some real signal so p-values
    span a wide range and the argmin paths are exercised)."""
    af = rng.uniform(0.1, 0.5, size=m)
    g = rng.binomial(2, af[:, None], size=(m, n)).astype(np.int8)
    beta = np.zeros(m)
    qtl = rng.choice(m, 12, replace=False)
    beta[qtl] = rng.normal(0, 1, 12)
    gsig = (g - g.mean(axis=1, keepdims=True)).T @ beta
    gsig *= np.sqrt(h2 / max(gsig.var(), 1e-12))
    y = gsig + rng.normal(0, np.sqrt(1 - h2), n)
    samples = np.array([f"i{j}" for j in range(n)], object)
    gd = GenotypeData(g, _sites(m), samples)
    return g, y, gd


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(20260820)
    g, y, gd = _panel(rng)
    pg = pack_genotypes(gd, QC_OFF)
    K = grm_from_packed(pg)
    return g, y, gd, pg, K


def test_sample_permutation_invariance(problem):
    """Relabeling samples (same permutation of y, G columns, K) must not
    change any per-SNP statistic."""
    g, y, gd, pg, K = problem
    rng = np.random.default_rng(1)
    perm = rng.permutation(len(y))
    gd_p = GenotypeData(g[:, perm], gd.sites, gd.samples[perm])
    pg_p = pack_genotypes(gd_p, QC_OFF)

    # f32 gram accumulation order changes under permutation: tolerances
    # are the measured f32 noise envelope (~1e-5 rel), not exactness
    r0 = lm_scan(pg, y)
    r1 = lm_scan(pg_p, y[perm])
    np.testing.assert_allclose(r1.beta, r0.beta, rtol=2e-4, atol=1e-8)
    lp0 = -np.log10(np.maximum(r0.pwald, 1e-300))
    lp1 = -np.log10(np.maximum(r1.pwald, 1e-300))
    assert np.max(np.abs(lp1 - lp0)) < 1e-4

    basis = eigh_grm(K)
    basis_p = eigh_grm(K[np.ix_(perm, perm)])
    s0, _ = lmm_scan(pg, basis, y)
    s1, _ = lmm_scan(pg_p, basis_p, y[perm])
    np.testing.assert_allclose(s1.beta, s0.beta, rtol=5e-3, atol=1e-6)
    lp0 = -np.log10(np.maximum(s0.pwald, 1e-300))
    lp1 = -np.log10(np.maximum(s1.pwald, 1e-300))
    assert np.max(np.abs(lp1 - lp0)) < 1e-3


def test_phenotype_affine_equivariance(problem):
    """y -> a*y + b: beta and se scale by a, p-values are unchanged
    (the intercept absorbs b; REML/OLS are scale-equivariant)."""
    g, y, gd, pg, K = problem
    a, b = 3.7, -11.0
    r0 = lm_scan(pg, y)
    r1 = lm_scan(pg, a * y + b)
    np.testing.assert_allclose(r1.beta, a * r0.beta, rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(r1.se, a * r0.se, rtol=1e-4)
    lp0 = -np.log10(np.maximum(r0.pwald, 1e-300))
    lp1 = -np.log10(np.maximum(r1.pwald, 1e-300))
    assert np.max(np.abs(lp1 - lp0)) < 1e-4

    # Round-4 regression: before make_rotated residualized y against the
    # design in f64, a constant offset (b=-11 here, i.e. a phenotype
    # mean ~10 sd from zero — heights, yields...) leaked into the f32
    # G-side grams and corrupted -log10 p by >1 unit.
    basis = eigh_grm(K)
    s0, n0 = lmm_scan(pg, basis, y)
    s1, n1 = lmm_scan(pg, basis, a * y + b)
    # lambda = ve/vg is invariant under any affine phenotype map
    assert abs(n1.log10_lbd - n0.log10_lbd) < 1e-6
    np.testing.assert_allclose(s1.beta, a * s0.beta, rtol=5e-2, atol=1e-4)
    lp0 = -np.log10(np.maximum(s0.pwald, 1e-300))
    lp1 = -np.log10(np.maximum(s1.pwald, 1e-300))
    assert np.max(np.abs(lp1 - lp0)) < 2e-3
    # a pure shift is absorbed exactly by the f64 projection
    s2, _ = lmm_scan(pg, basis, y + 1000.0)
    np.testing.assert_array_equal(s2.pwald, s0.pwald)
    np.testing.assert_array_equal(s2.beta, s0.beta)


def test_duplicate_snp_and_block_layout(problem):
    """The same SNP inserted at distant indices (different scan blocks,
    including the padded tail block) must produce identical statistics,
    and the scan must not depend on the block size."""
    g, y, gd, pg, K = problem
    m, n = g.shape
    # duplicate SNP 5 at the very end (tail block) and SNP 17 mid-panel
    g2 = np.concatenate([g, g[[5, 17]], g[[5]]], axis=0)
    gd2 = GenotypeData(g2, _sites(g2.shape[0]), gd.samples)
    pg2 = pack_genotypes(gd2, QC_OFF)

    r = lm_scan(pg2, y, block=512)
    np.testing.assert_allclose(r.beta[m], r.beta[5], rtol=1e-12)
    np.testing.assert_allclose(r.beta[m + 2], r.beta[5], rtol=1e-12)
    np.testing.assert_allclose(r.beta[m + 1], r.beta[17], rtol=1e-12)
    np.testing.assert_allclose(r.pwald[m], r.pwald[5], rtol=1e-12)

    # different block sizes change the XLA matmul tiling: f32 envelope
    r_big = lm_scan(pg2, y, block=4096)
    np.testing.assert_allclose(r_big.beta, r.beta, rtol=1e-4, atol=1e-8)
    lpb = -np.log10(np.maximum(r_big.pwald, 1e-300))
    lps = -np.log10(np.maximum(r.pwald, 1e-300))
    assert np.max(np.abs(lpb - lps)) < 1e-4

    basis = eigh_grm(K)
    s, _ = lmm_scan(pg2, basis, y, block=512)
    s2, _ = lmm_scan(pg2, basis, y, block=2048)
    np.testing.assert_allclose(s.beta[m], s.beta[5], rtol=1e-10)
    np.testing.assert_allclose(s.pwald[m], s.pwald[5], rtol=1e-10)
    np.testing.assert_allclose(s2.beta, s.beta, rtol=1e-4, atol=1e-8)
    lp = -np.log10(np.maximum(s.pwald, 1e-300))
    lp2 = -np.log10(np.maximum(s2.pwald, 1e-300))
    assert np.max(np.abs(lp2 - lp)) < 1e-4


def test_kinship_scale_invariance(problem):
    """K -> c*K leaves the LMM fit invariant: vg absorbs 1/c, so
    lambda = ve/vg scales UP by c (log10 lambda shifts by +log10 c,
    well inside the search range); per-SNP stats are unchanged up to
    grid-cell requantization of the shifted optimum."""
    g, y, gd, pg, K = problem
    b0 = eigh_grm(K)
    b1 = eigh_grm(4.0 * K)
    s0, n0 = lmm_scan(pg, b0, y)
    s1, n1 = lmm_scan(pg, b1, y)
    assert abs((n1.log10_lbd - np.log10(4.0)) - n0.log10_lbd) < 2e-2
    lp0 = -np.log10(np.maximum(s0.pwald, 1e-300))
    lp1 = -np.log10(np.maximum(s1.pwald, 1e-300))
    assert np.max(np.abs(lp1 - lp0)) < 5e-3
    np.testing.assert_allclose(s1.beta, s0.beta, rtol=5e-2, atol=1e-4)


def test_allele_flip_consistency(problem):
    """A SNP and its 2-g recode normalize to the same minor-allele coding
    inside prepare(): statistics must be identical."""
    g, y, gd, pg, K = problem
    m = g.shape[0]
    flipped = (2 - g[[3, 40, 99]]).astype(np.int8)
    g2 = np.concatenate([g, flipped], axis=0)
    gd2 = GenotypeData(g2, _sites(g2.shape[0]), gd.samples)
    pg2 = pack_genotypes(gd2, QC_OFF)
    np.testing.assert_allclose(
        pg2.af[[m, m + 1, m + 2]], pg2.af[[3, 40, 99]], rtol=1e-12
    )
    r = lm_scan(pg2, y)
    for k, src in enumerate((3, 40, 99)):
        np.testing.assert_allclose(np.abs(r.beta[m + k]), np.abs(r.beta[src]),
                                   rtol=1e-10)
        np.testing.assert_allclose(r.pwald[m + k], r.pwald[src], rtol=1e-10)


def test_splmm_affine_equivariance(problem):
    """Sparse routes: y -> a*y + b leaves p-values unchanged and scales
    beta by a. Regression for the exact scan's device g'Py path, which
    used to compute t1 - T2.CvXa in f32 with the unprojected V^-1 y —
    a phenotype offset leaked linearly into -log10 p (fixed by forming
    the mean-free Py = a_y - A_X CvXa in f64 on host)."""
    from janusx_tpu.models.splmm import splmm_exact_scan, splmm_grammar_scan

    g, y, gd, pg, K = problem
    a, b = 3.7, -11.0
    for scan in (splmm_grammar_scan, splmm_exact_scan):
        r0, _ = scan(pg, K, y)
        r1, _ = scan(pg, K, a * y + b)
        lp0 = -np.log10(np.maximum(r0.pwald, 1e-300))
        lp1 = -np.log10(np.maximum(r1.pwald, 1e-300))
        assert np.max(np.abs(lp1 - lp0)) < 1e-3, scan.__name__
        np.testing.assert_allclose(r1.beta, a * r0.beta, rtol=5e-2,
                                   atol=1e-4)
        # an extreme pure shift must stay in the f64-projection class
        r2, _ = scan(pg, K, y + 1e5)
        lp2 = -np.log10(np.maximum(r2.pwald, 1e-300))
        assert np.max(np.abs(lp2 - lp0)) < 2e-3, scan.__name__


def test_gblup_affine_and_permutation(problem):
    """GS: y -> a*y + b maps GEBV predictions to a*pred + b exactly
    (lambda is affine-invariant); relabeling samples permutes
    predictions with no numeric change."""
    from janusx_tpu.gs.blup import fit_gblup, predict_gblup

    g, y, gd, pg, K = problem
    n = len(y)
    rng = np.random.default_rng(2)
    tr = np.arange(0, 160)
    te = np.arange(160, n)
    a, b = 2.5, 40.0
    m0 = fit_gblup(K, y, tr)
    m1 = fit_gblup(K, a * y + b, tr)
    p0 = predict_gblup(m0, K, te)
    p1 = predict_gblup(m1, K, te)
    # residual is Brent-tolerance class (~1e-6), not f32
    np.testing.assert_allclose(p1, a * p0 + b, rtol=0, atol=1e-4)
    assert abs(m1.lbd - m0.lbd) < 1e-5

    perm = rng.permutation(n)
    inv = np.empty(n, int)
    inv[perm] = np.arange(n)
    Kp = K[np.ix_(perm, perm)]
    mp = fit_gblup(Kp, y[perm], inv[tr])
    pp = predict_gblup(mp, Kp, inv[te])
    np.testing.assert_allclose(pp, p0, rtol=0, atol=1e-10)


def test_bayes_affine_equivariance():
    """Seeded Gibbs chains are affine-equivariant: with the same PRNG
    stream, y -> a*y + b scales marker effects by a and maps mu to
    a*mu + b. Exact for BayesA/Cpi (the chain is driven by standard
    normals scaled by posterior sd); BayesB admits indicator flips on
    borderline markers (MC discreteness), hence the looser bound."""
    from janusx_tpu.gs.bayes import bayes_fit

    rng = np.random.default_rng(3)
    n, m = 150, 200
    Z = rng.normal(size=(n, m))
    Z = (Z - Z.mean(0)) / Z.std(0)
    bt = np.zeros(m)
    bt[rng.choice(m, 8, False)] = rng.normal(0, 0.5, 8)
    y = Z @ bt + rng.normal(size=n)
    a, b = 2.5, 40.0
    for meth, tol in (("BayesA", 1e-4), ("BayesB", 5e-2), ("BayesCpi", 1e-4)):
        b0, mu0 = bayes_fit(Z, y, meth, n_iter=120, burnin=60, seed=0)
        b1, mu1 = bayes_fit(Z, a * y + b, meth, n_iter=120, burnin=60, seed=0)
        scale = max(np.abs(a * b0).max(), 1e-12)
        assert np.max(np.abs(b1 - a * b0)) / scale < tol, meth
        assert abs(mu1 - (a * mu0 + b)) < 5e-3 * max(abs(a * mu0 + b), 1), meth


def test_workflow_subset_consistency(tmp_path):
    """Samples with missing phenotype must not change results for the
    phenotyped rest. LM is EXACT (the design only sees masked samples).
    LMM agrees to GRM-semantics tolerance: the kinship is built once on
    the full panel and trait-subset (reference load_or_build_grm
    semantics, assoc/workflow.py:3123), so its allele frequencies see
    the unphenotyped samples — a panel with those samples physically
    absent has a slightly different K by construction."""
    import pandas as pd

    from janusx_tpu.io.plink import write_plink_genotypes
    from janusx_tpu.workflows.gwas import GwasConfig, run_gwas

    rng = np.random.default_rng(21)
    m, n, drop = 400, 220, 40
    g, y, gd = _panel(rng, m=m, n=n)
    td = str(tmp_path)
    pa = f"{td}/a"
    write_plink_genotypes(pa, gd)
    with open(f"{td}/a.pheno", "w") as fh:
        fh.write("id\ttrait\n")
        for j in range(n):
            v = f"{y[j]:.10g}" if j < n - drop else "NA"
            fh.write(f"i{j}\t{v}\n")
    gd_b = GenotypeData(g[:, : n - drop], gd.sites, gd.samples[: n - drop])
    pb = f"{td}/b"
    write_plink_genotypes(pb, gd_b)
    with open(f"{td}/b.pheno", "w") as fh:
        fh.write("id\ttrait\n")
        for j in range(n - drop):
            fh.write(f"i{j}\t{y[j]:.10g}\n")

    def run(prefix, models, tag):
        cfg = GwasConfig(
            genotype=f"{prefix}.bed", phenotype=f"{prefix}.pheno",
            models=models, out_prefix=f"{td}/out_{tag}",
            force_model=True, maf=0.0, geno=1.0, het=1.0,
        )
        return pd.read_csv(run_gwas(cfg)[0].tsv_path, sep="\t")

    for models, tol in ((("lm",), 0.0), (("lmm",), 2e-2)):
        da = run(pa, models, f"a{models[0]}")
        db = run(pb, models, f"b{models[0]}")
        assert len(da) == len(db) == m
        assert (da.snp.values == db.snp.values).all()
        lpa = -np.log10(np.maximum(da.pwald.values, 1e-300))
        lpb = -np.log10(np.maximum(db.pwald.values, 1e-300))
        d = np.max(np.abs(lpa - lpb))
        if tol == 0.0:
            assert d == 0.0, models
            np.testing.assert_array_equal(da.beta.values, db.beta.values)
        else:
            assert d < tol, (models, d)


def test_assoc_api_flip_sign():
    """Raw-dosage API: recoding a column as 2-g must flip the sign of
    beta and preserve |beta|, se, p (reference LinearModel semantics)."""
    from janusx_tpu.api import ASSOC

    rng = np.random.default_rng(5)
    n, m = 150, 40
    G = rng.binomial(2, 0.3, size=(n, m)).astype(float)
    y = G[:, 7] * 0.5 + rng.normal(size=n)
    res0 = ASSOC(model="lm").fit(y).assoc(G)
    G2 = G.copy()
    G2[:, 7] = 2 - G2[:, 7]
    res1 = ASSOC(model="lm").fit(y).assoc(G2)
    np.testing.assert_allclose(res1.beta[7], -res0.beta[7], rtol=1e-9)
    np.testing.assert_allclose(res1.se[7], res0.se[7], rtol=1e-9)
    np.testing.assert_allclose(res1.pwald[7], res0.pwald[7], rtol=1e-9)
    other = np.arange(m) != 7
    np.testing.assert_allclose(res1.beta[other], res0.beta[other], rtol=1e-9)
