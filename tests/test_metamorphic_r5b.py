"""Round-5 metamorphic extensions: models without structural-invariance
coverage (low-rank FaST-LMM, HE regression, AI-REML, the lm2/fvlmm2 G×E
scans, KING). Same contract as tests/test_metamorphic.py: each test pins
a mathematical identity the production code must satisfy on random data,
catching the f32-leak / padding / asymmetry bug class goldens can't see.
"""

import numpy as np
import pytest

from janusx_tpu.core.spectral import eigh_grm
from janusx_tpu.io.gdata import GenotypeData, SiteInfo
from janusx_tpu.io.packed import QcParams, pack_genotypes
from janusx_tpu.models.fastlmm import fastlmm_scan, lowrank_basis_from_snps
from janusx_tpu.models.grm import grm_from_packed
from janusx_tpu.models.gxe import gxe_scan
from janusx_tpu.models.he import he_regression
from janusx_tpu.models.king import king_kinship
from janusx_tpu.models.vcomp import RandomTerm, ai_reml

QC_OFF = QcParams(maf=0.0, geno=1.0, het=1.0)


def _sites(m: int) -> SiteInfo:
    return SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(m, dtype=np.int64) + 1,
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )


def _panel(rng, m=600, n=200, h2=0.4):
    af = rng.uniform(0.1, 0.5, size=m)
    g = rng.binomial(2, af[:, None], size=(m, n)).astype(np.int8)
    beta = np.zeros(m)
    qtl = rng.choice(m, 10, replace=False)
    beta[qtl] = rng.normal(0, 1, 10)
    gsig = (g - g.mean(axis=1, keepdims=True)).T @ beta
    gsig *= np.sqrt(h2 / max(gsig.var(), 1e-12))
    y = gsig + rng.normal(0, np.sqrt(1 - h2), n)
    samples = np.array([f"i{j}" for j in range(n)], object)
    return g, y, GenotypeData(g, _sites(m), samples)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(20260821)
    g, y, gd = _panel(rng)
    pg = pack_genotypes(gd, QC_OFF)
    K = grm_from_packed(pg)
    return g, y, gd, pg, K


def _logp(p):
    return -np.log10(np.maximum(p, 1e-300))


# -- low-rank FaST-LMM route ------------------------------------------------


def test_lowrank_affine_equivariance(problem):
    """y -> a*y + b under the low-rank route: the null λ is invariant,
    beta/se scale by a, p-values are unchanged (complement-corrected
    REML is affine-equivariant like the dense route)."""
    g, y, gd, pg, K = problem
    lrb = lowrank_basis_from_snps(pg, q=128)
    a, b = 2.9, 17.0
    r0, n0 = fastlmm_scan(pg, lrb, y)
    r1, n1 = fastlmm_scan(pg, lrb, a * y + b)
    assert abs(n1.log10_lbd - n0.log10_lbd) < 1e-3
    np.testing.assert_allclose(r1.beta, a * r0.beta, rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(r1.se, a * r0.se, rtol=5e-3, atol=1e-4)
    # f32 per-SNP scan products under a 2.9x phenotype scale: the
    # project-wide parity envelope (5e-3 in -log10 p) applies
    assert np.max(np.abs(_logp(r1.pwald) - _logp(r0.pwald))) < 5e-3


def test_lowrank_sample_permutation(problem):
    """Relabeling samples (same permutation of y and genotype columns,
    identical kinship-SNP subset) must not change per-SNP statistics."""
    g, y, gd, pg, K = problem
    idx = np.arange(0, pg.m, 5)  # fixed kinship subset on both sides
    lrb = lowrank_basis_from_snps(pg, snp_idx=idx)
    rng = np.random.default_rng(3)
    perm = rng.permutation(len(y))
    gd_p = GenotypeData(g[:, perm], gd.sites, gd.samples[perm])
    pg_p = pack_genotypes(gd_p, QC_OFF)
    lrb_p = lowrank_basis_from_snps(pg_p, snp_idx=idx)
    r0, n0 = fastlmm_scan(pg, lrb, y)
    r1, n1 = fastlmm_scan(pg_p, lrb_p, y[perm])
    assert abs(n1.log10_lbd - n0.log10_lbd) < 1e-5
    np.testing.assert_allclose(r1.beta, r0.beta, rtol=5e-3, atol=1e-6)
    assert np.max(np.abs(_logp(r1.pwald) - _logp(r0.pwald))) < 1e-3


# -- HE regression / AI-REML ------------------------------------------------


def test_he_affine_equivariance(problem):
    """y -> a*y + b: HE variance components scale by a² (the intercept
    absorbs b), so h² is invariant. Host f64 math — tight tolerance."""
    g, y, gd, pg, K = problem
    a, b = 3.3, -40.0
    f0 = he_regression(K, y)
    f1 = he_regression(K, a * y + b)
    np.testing.assert_allclose(f1.vg, a * a * f0.vg, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(f1.ve, a * a * f0.ve, rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(f1.h2, f0.h2, rtol=1e-9, atol=1e-12)


def test_ai_reml_scale_equivariance(problem):
    """AI-REML: y -> a*y scales every variance component by a² and the
    BLUE by a; variance proportions and the iteration path-independent
    h² are invariant."""
    g, y, gd, pg, K = problem
    n = len(y)
    X = np.ones((n, 1))
    a = 0.37
    r0 = ai_reml(y, X, [RandomTerm(name="g", Z=None, K=K)])
    r1 = ai_reml(a * y, X, [RandomTerm(name="g", Z=None, K=K)])
    assert r0.converged and r1.converged
    for k in r0.sigma2:
        np.testing.assert_allclose(
            r1.sigma2[k], a * a * r0.sigma2[k], rtol=1e-5, atol=1e-12
        )
    for k in r0.h2:
        np.testing.assert_allclose(r1.h2[k], r0.h2[k], rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(r1.blue, a * r0.blue, rtol=1e-5, atol=1e-12)


# -- G×E scans (lm2 / fvlmm2) ----------------------------------------------


def _gxe_env(rng, n):
    return rng.normal(1.0, 0.6, n)  # non-centered on purpose (raw covariate)


def test_lm2_interaction_covariate_scale(problem):
    """Scaling the interaction covariate c -> s*c rescales the
    interaction coefficient by 1/s and leaves every p-value (main,
    interaction, joint) and the main-effect beta unchanged — the fitted
    design spans the same space."""
    g, y, gd, pg, K = problem
    rng = np.random.default_rng(11)
    c = _gxe_env(rng, len(y))
    s = 4.0
    r0, _ = gxe_scan(pg, y, c)
    r1, _ = gxe_scan(pg, y, s * c)
    np.testing.assert_allclose(r1.beta, r0.beta, rtol=2e-4, atol=1e-7)
    assert np.max(np.abs(_logp(r1.pwald) - _logp(r0.pwald))) < 1e-3
    np.testing.assert_allclose(
        r1.extra_cols["beta_i1"], r0.extra_cols["beta_i1"] / s,
        rtol=2e-4, atol=1e-7,
    )
    for col in ("pwald_i1", "p_int_joint", "p_joint"):
        if col in r0.extra_cols:
            assert np.max(np.abs(
                _logp(r1.extra_cols[col]) - _logp(r0.extra_cols[col])
            )) < 1e-3


def test_fvlmm2_interaction_covariate_scale(problem):
    """Same identity under the mixed (fixed-λ, whitened) fvlmm2 route."""
    g, y, gd, pg, K = problem
    rng = np.random.default_rng(13)
    c = _gxe_env(rng, len(y))
    s = 0.25
    basis = eigh_grm(K, diag_ridge=1e-6)
    r0, n0 = gxe_scan(pg, y, c, basis=basis)
    r1, n1 = gxe_scan(pg, y, s * c, basis=basis)
    # the null model covariates span the same space: same λ
    assert abs(n1.log10_lbd - n0.log10_lbd) < 1e-6
    np.testing.assert_allclose(r1.beta, r0.beta, rtol=5e-3, atol=1e-6)
    assert np.max(np.abs(_logp(r1.pwald) - _logp(r0.pwald))) < 2e-3
    np.testing.assert_allclose(
        r1.extra_cols["beta_i1"], r0.extra_cols["beta_i1"] / s,
        rtol=5e-3, atol=1e-6,
    )
    assert np.max(np.abs(
        _logp(r1.extra_cols["pwald_i1"]) - _logp(r0.extra_cols["pwald_i1"])
    )) < 2e-3


# -- KING -------------------------------------------------------------------


def test_king_sample_permutation(problem):
    """KING-robust kinship is a per-pair statistic: permuting samples
    permutes both axes of the matrix and nothing else. Integer indicator
    counts — exact equality."""
    g, y, gd, pg, K = problem
    rng = np.random.default_rng(17)
    perm = rng.permutation(pg.n)
    gd_p = GenotypeData(g[:, perm], gd.sites, gd.samples[perm])
    pg_p = pack_genotypes(gd_p, QC_OFF)
    phi = king_kinship(pg)
    phi_p = king_kinship(pg_p)
    np.testing.assert_allclose(
        phi_p, phi[np.ix_(perm, perm)], rtol=0, atol=1e-12
    )


# -- GRAMMAR-γ sparse route -------------------------------------------------


def test_splmm_grammar_sample_permutation(problem):
    """The GRAMMAR-γ approximate scan is sample-permutation equivariant:
    permuting y, genotype columns and both kinship axes leaves every
    per-SNP statistic unchanged (γ calibration samples MARKERS by seed,
    which is permutation-independent)."""
    from janusx_tpu.models.splmm import splmm_grammar_scan

    g, y, gd, pg, K = problem
    rng = np.random.default_rng(23)
    perm = rng.permutation(pg.n)
    gd_p = GenotypeData(g[:, perm], gd.sites, gd.samples[perm])
    pg_p = pack_genotypes(gd_p, QC_OFF)
    r0, info0 = splmm_grammar_scan(pg, K, y, seed=5)
    r1, info1 = splmm_grammar_scan(
        pg_p, K[np.ix_(perm, perm)], y[perm], seed=5
    )
    assert info1["lambda_null"] == pytest.approx(
        info0["lambda_null"], rel=1e-6
    )
    assert info1["gamma"] == pytest.approx(info0["gamma"], rel=1e-4)
    np.testing.assert_allclose(r1.beta, r0.beta, rtol=5e-3, atol=1e-6)
    assert np.max(np.abs(_logp(r1.pwald) - _logp(r0.pwald))) < 5e-3


# -- LD prune ---------------------------------------------------------------


def test_ld_prune_position_shift_invariance(problem):
    """bp-windowed LD pruning depends only on pairwise POSITION GAPS:
    translating every coordinate by a constant yields the identical kept
    set (and the count-window mode ignores positions entirely)."""
    from janusx_tpu.models.ldprune import ld_prune

    g, y, gd, pg, K = problem
    rng = np.random.default_rng(29)
    m = pg.m
    pos = np.cumsum(rng.integers(50, 2000, m)).astype(np.int64)
    sites = SiteInfo(
        chrom=gd.sites.chrom, pos=pos, snp=gd.sites.snp,
        allele0=gd.sites.allele0, allele1=gd.sites.allele1,
    )
    gd_a = GenotypeData(g, sites, gd.samples)
    pg_a = pack_genotypes(gd_a, QC_OFF)
    shift = 7_919_000
    sites_b = SiteInfo(
        chrom=gd.sites.chrom, pos=pos + shift, snp=gd.sites.snp,
        allele0=gd.sites.allele0, allele1=gd.sites.allele1,
    )
    pg_b = pack_genotypes(GenotypeData(g, sites_b, gd.samples), QC_OFF)
    for kw in ({"window_bp": 50_000}, {"window": 50, "step": 5}):
        keep_a = ld_prune(pg_a, r2_threshold=0.2, **kw)
        keep_b = ld_prune(pg_b, r2_threshold=0.2, **kw)
        np.testing.assert_array_equal(keep_a, keep_b)


# -- BSA --------------------------------------------------------------------


def test_bsa_bulk_swap_antisymmetry():
    """Swapping the two bulks negates Δ-SNP-index and leaves the G
    statistic, G′ and the Euclidean distance unchanged (host f64 —
    exact)."""
    from janusx_tpu.models.bsa import bsa_analysis

    rng = np.random.default_rng(31)
    m = 500
    chrom = np.array(["1"] * (m // 2) + ["2"] * (m - m // 2), object)
    pos = np.concatenate([
        np.sort(rng.integers(1, 10_000_000, m // 2)),
        np.sort(rng.integers(1, 10_000_000, m - m // 2)),
    ]).astype(np.int64)
    depth1 = rng.integers(5, 60, m).astype(np.float64)
    depth2 = rng.integers(5, 60, m).astype(np.float64)
    alt1 = np.round(depth1 * rng.uniform(0, 1, m))
    ref1 = depth1 - alt1
    alt2 = np.round(depth2 * rng.uniform(0, 1, m))
    ref2 = depth2 - alt2
    r0 = bsa_analysis(chrom, pos, alt1, ref1, alt2, ref2)
    r1 = bsa_analysis(chrom, pos, alt2, ref2, alt1, ref1)
    np.testing.assert_array_equal(r1.delta, -r0.delta)
    # G/ED/G' are symmetric functions of the two bulks; operand order
    # changes f64 summation order, so 'exact' here means ~1 ulp
    kw = dict(rtol=1e-12, atol=1e-12, equal_nan=True)
    np.testing.assert_allclose(r1.g_stat, r0.g_stat, **kw)
    np.testing.assert_allclose(r1.ed, r0.ed, **kw)
    np.testing.assert_allclose(r1.g_prime, r0.g_prime, **kw)
    np.testing.assert_array_equal(r1.snp_index1, r0.snp_index2)


# -- multi-locus routes (FarmCPU / ALGWAS) ----------------------------------


@pytest.fixture(scope="module")
def big_problem():
    rng = np.random.default_rng(77)
    g, y, gd = _panel(rng, m=900, n=260)
    return g, y, pack_genotypes(gd, QC_OFF)


def test_farmcpu_affine_equivariance(big_problem):
    """y -> a*y + b through the full FEM/REM/SUPER iteration: identical
    pseudo-QTN selection at every loop and identical final p-values —
    the selection dynamics (bins, REM grid, thresholds) are all built
    from scale-free statistics."""
    from janusx_tpu.models.farmcpu import farmcpu_scan

    g, y, pg = big_problem
    r0 = farmcpu_scan(pg, y)
    r1 = farmcpu_scan(pg, 3.0 * y + 10.0)
    assert sorted(r0.qtns) == sorted(r1.qtns)
    assert r0.loops == r1.loops
    assert [sorted(s) for s in (r0.loop_sets or [])] == [
        sorted(s) for s in (r1.loop_sets or [])
    ]
    assert np.max(np.abs(
        _logp(r1.result.pwald) - _logp(r0.result.pwald)
    )) < 1e-4


def test_algwas_affine_equivariance(big_problem):
    """y -> a*y + b through the adaptive-lasso stage-1 + scan stage-2:
    the EBIC-selected support and the stage-2 p-values are invariant
    (the lasso path scales with y, EBIC ranks the same models)."""
    from janusx_tpu.models.algwas import algwas_scan

    g, y, pg = big_problem
    a0 = algwas_scan(pg, y)
    a1 = algwas_scan(pg, 3.0 * y + 10.0)
    np.testing.assert_array_equal(np.sort(a0.selected), np.sort(a1.selected))
    assert np.max(np.abs(
        _logp(a1.result.pwald) - _logp(a0.result.pwald)
    )) < 1e-4


# -- GARFIELD ---------------------------------------------------------------


def test_garfield_sample_permutation_rule_set(problem):
    """The GARFIELD beam search over hom-alt bitplanes is
    sample-permutation invariant at the RULE-SET level: the same logic
    rules (canonicalized — AND/XOR operands are order-free) with the
    same scores, up to f32 tie noise in discovery order."""
    from janusx_tpu.models.garfield import garfield_scan

    g, y, gd, pg, K = problem
    rng = np.random.default_rng(41)
    perm = rng.permutation(pg.n)
    gd_p = GenotypeData(g[:, perm], gd.sites, gd.samples[perm])
    pg_p = pack_genotypes(gd_p, QC_OFF)
    r0 = garfield_scan(pg, y, depth=2, beam=32, n_perm=20)
    r1 = garfield_scan(pg_p, y[perm], depth=2, beam=32, n_perm=20)

    def canon(rule):
        # ANDN is order-sensitive; AND/XOR chains are not
        if "ANDN" in rule.ops or "NOT" in rule.ops:
            return (rule.snps, rule.ops)
        return (tuple(sorted(rule.snps)), tuple(sorted(rule.ops)))

    top0 = {canon(r): r.score for r in r0.rules[:20]}
    top1 = {canon(r): r.score for r in r1.rules[:20]}
    shared = set(top0) & set(top1)
    # near-total overlap (boundary rules may swap with rank 21+ on ties)
    assert len(shared) >= 18
    for k in shared:
        assert top1[k] == pytest.approx(top0[k], abs=1e-5)
    # supports are integer counts of identical boolean vectors: exact
    sup0 = {canon(r): r.support for r in r0.rules[:20]}
    sup1 = {canon(r): r.support for r in r1.rules[:20]}
    for k in shared:
        assert sup0[k] == sup1[k]


# -- line-nested REML (jx reml engine) --------------------------------------


def test_line_nested_reml_scale_equivariance():
    """fit_line_nested (the jx reml multi-VC engine): y -> a*y scales
    every variance component by a² and the BLUE by a. The design has 2
    replicates of each year WITHIN each line: a term with a single
    observation per (line, level) cell is exactly confounded with the
    residual in the line-nested (block-diagonal) structure — the REML
    surface is then a flat ridge in (σ²_term, σ²_e) and only the sum is
    identified (verified: objective differs by ~1e-11 across the ridge)."""
    from janusx_tpu.models.lme import NestedTerm, fit_line_nested

    rng = np.random.default_rng(67)
    L, n_year, n_rep = 50, 4, 2
    N = L * n_year * n_rep
    lines = np.repeat(np.arange(L), n_year * n_rep)
    year = np.tile(np.repeat(np.arange(n_year), n_rep), L)
    y = (
        5.0
        + rng.normal(0, 1.0, L)[lines]
        + rng.normal(0, 0.6, (L, n_year))[lines, year]  # line-specific year
        + rng.normal(0, 0.8, N)
    )
    X = np.ones((N, 1))
    terms = [NestedTerm("year", year, np.ones(N), n_year, None)]
    a = 2.5
    f0 = fit_line_nested(y, X, lines, terms)
    f1 = fit_line_nested(a * y, X, lines, terms)
    assert f0.converged and f1.converged
    for k in f0.sigma2:
        assert f1.sigma2[k] == pytest.approx(
            a * a * f0.sigma2[k], rel=2e-2
        ), k
    np.testing.assert_allclose(f1.beta, a * f0.beta, rtol=1e-6)
    np.testing.assert_allclose(f1.beta_se, a * f0.beta_se, rtol=2e-2)
