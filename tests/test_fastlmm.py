"""FaST-LMM low-rank scan: parity against the dense spectral route.

The low-rank route is mathematically the SAME model as the dense exact
LMM whenever the kinship used by the dense route is exactly the low-rank
K = W W' (+ diag ridge): identical REML objective, identical λ*, beta,
se. These tests build K from q < n SNP columns, run both routes, and
require agreement."""

import numpy as np
import pytest

from janusx_tpu.core.spectral import eigh_grm
from janusx_tpu.io.gdata import GenotypeData, SiteInfo
from janusx_tpu.io.packed import QcParams, pack_genotypes
from janusx_tpu.models.fastlmm import (
    fastlmm_scan,
    fit_null_reml_lr,
    lowrank_basis_from_snps,
    make_rotated_lr,
    select_kinship_snps,
)
from janusx_tpu.models.grm import grm_from_packed
from janusx_tpu.models.lmm import lmm_scan


@pytest.fixture(scope="module")
def lr_problem():
    rng = np.random.default_rng(11)
    m, n, q = 300, 200, 64
    p = rng.uniform(0.1, 0.5, size=m)
    g = rng.binomial(2, p[:, None], size=(m, n)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"rs{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )
    gd = GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object))
    pg = pack_genotypes(gd, QcParams(maf=0.05, geno=0.05))
    idx = select_kinship_snps(pg.m, q)
    lrb = lowrank_basis_from_snps(pg, snp_idx=idx, ridge=1e-6)
    # dense kinship from the SAME columns + the same ridge
    K = grm_from_packed(pg.take_snps(idx), method=1)
    basis = eigh_grm(K, diag_ridge=1e-6)
    cov = rng.normal(size=(n, 1))
    # trait with real signal so λ* is interior
    u = lrb.U[:, 0]
    y = 0.4 * cov[:, 0] + 3.0 * u + pg.centered()[5] * 0.8 + rng.normal(size=n)
    return pg, lrb, basis, cov, y


def test_lowrank_basis_matches_dense_eigh(lr_problem):
    pg, lrb, basis, cov, y = lr_problem
    # top eigenvalues of the dense (ridged) K = low-rank S + ridge
    k = lrb.k
    dense_top = basis.S[::-1][:k]  # basis.S ascending
    np.testing.assert_allclose(dense_top, lrb.S + 1e-6, rtol=1e-6, atol=1e-6)


def test_lowrank_null_matches_dense_null(lr_problem):
    from janusx_tpu.core.reml import fit_null_reml_host

    pg, lrb, basis, cov, y = lr_problem
    rot = make_rotated_lr(lrb, y, cov)
    null_lr, beta_lr, vg_lr = fit_null_reml_lr(rot)
    X = np.concatenate([np.ones((pg.n, 1)), cov], axis=1)
    # make_rotated_lr residualizes y onto span(X) (round-5 invariance
    # fix); feed the dense reference the same residualized phenotype so
    # the two objectives are evaluated on identical data
    c0, *_ = np.linalg.lstsq(X, y, rcond=None)
    y_res = y - X @ c0
    null_d, beta_d, vg_d = fit_null_reml_host(
        basis.S, basis.U.T @ X, basis.U.T @ y_res
    )
    assert null_lr.log10_lbd == pytest.approx(null_d.log10_lbd, abs=2e-2)
    assert null_lr.ml == pytest.approx(null_d.ml, rel=1e-5, abs=1e-4)
    np.testing.assert_allclose(beta_lr, beta_d, rtol=1e-4, atol=1e-6)
    # OLS-residualized y is only GLS-orthogonal to X at λ→∞: the null
    # beta is small (OLS≠GLS weighting) but not exactly zero
    assert np.max(np.abs(beta_lr)) < 0.05


def test_lowrank_scan_matches_dense_scan(lr_problem):
    pg, lrb, basis, cov, y = lr_problem
    res_lr, null_lr = fastlmm_scan(pg, lrb, y, cov, block=128)
    res_d, null_d = lmm_scan(pg, basis, y, cov, block=128)
    ok = np.isfinite(res_d.beta) & np.isfinite(res_lr.beta)
    assert ok.mean() > 0.95
    np.testing.assert_allclose(res_lr.beta[ok], res_d.beta[ok], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(res_lr.se[ok], res_d.se[ok], rtol=2e-3, atol=2e-4)
    lp_lr = -np.log10(np.clip(res_lr.pwald[ok], 1e-300, 1.0))
    lp_d = -np.log10(np.clip(res_d.pwald[ok], 1e-300, 1.0))
    np.testing.assert_allclose(lp_lr, lp_d, atol=2e-2)


def test_lowrank_lmm2_lrt(lr_problem):
    pg, lrb, basis, cov, y = lr_problem
    res_lr, _ = fastlmm_scan(pg, lrb, y, cov, block=128, lmm2=True)
    res_d, _ = lmm_scan(pg, basis, y, cov, block=128, lmm2=True)
    ok = np.isfinite(res_d.plrt) & np.isfinite(res_lr.plrt) & (res_d.plrt < 1) & (res_lr.plrt < 1)
    lp_lr = -np.log10(np.clip(res_lr.plrt[ok], 1e-300, 1.0))
    lp_d = -np.log10(np.clip(res_d.plrt[ok], 1e-300, 1.0))
    np.testing.assert_allclose(lp_lr, lp_d, atol=5e-2)


def test_genetic_models_run(lr_problem):
    pg, lrb, basis, cov, y = lr_problem
    for model in ("dom", "rec", "het"):
        res, _ = fastlmm_scan(pg, lrb, y, cov, block=128, model=model)
        assert np.isfinite(res.pwald[np.isfinite(res.beta)]).all()
        # indicator transforms change the tested predictor: betas differ
        # from the additive route for polymorphic sites
        assert res.m == pg.m


def test_lowrank_workflow_route(tmp_path):
    """run_gwas -lowrank end-to-end: no dense GRM is built, TSV written,
    and the LMM->LM auto-switch fires on a heritability-free trait."""
    import os

    import pandas as pd

    from janusx_tpu.workflows.gwas import GwasConfig, run_gwas

    rng = np.random.default_rng(2)
    m, n = 240, 120
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.io import plink

    p = rng.uniform(0.2, 0.5, size=m)
    g = rng.binomial(2, p[:, None], size=(m, n)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(1, m + 1, dtype=np.int64) * 100,
        snp=np.array([f"rs{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )
    gd = GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object))
    base = str(tmp_path / "toy")
    plink.write_plink_genotypes(base, gd)
    # trait 0: strong polygenic signal; trait 1: pure noise (switch -> lm)
    gc = g - g.mean(axis=1, keepdims=True)
    y0 = gc[:40].sum(axis=0) * 0.3 + rng.normal(size=n) * 0.5
    y1 = rng.normal(size=n)
    with open(base + ".pheno", "wt") as fh:
        fh.write("id\tt0\tt1\n")
        for j in range(n):
            fh.write(f"i{j}\t{y0[j]:.5f}\t{y1[j]:.5f}\n")
    cfg = GwasConfig(
        genotype=base + ".bed", phenotype=base + ".pheno",
        out_prefix=str(tmp_path / "jx"), models=("lowrank",),
        lowrank_snps=64, maf=0.01, use_cache=False, n_devices=1,
    )
    runs = run_gwas(cfg)
    assert len(runs) == 2
    r0 = runs[0]
    assert r0.model == "lowrank" and r0.tsv_path.endswith("FaSTLMM.assoc.tsv")
    df = pd.read_csv(r0.tsv_path, sep="\t")
    assert len(df) == r0.n_snps and np.isfinite(df["pwald"]).all()
    # noise trait switches to LM
    assert runs[1].model == "lm" and runs[1].switch_lrt_p >= 0.05
    assert os.path.exists(str(tmp_path / "jx") + ".gwas.summary.json")


def test_genetic_model_missing_handling():
    """dom/rec/het indicators come from TRUE codes; missing genotypes are
    imputed with the transformed-column mean (centering -> exactly 0),
    never coded as deterministic carriers."""
    import jax.numpy as jnp

    from janusx_tpu.io import bitcodec
    from janusx_tpu.models.fastlmm import _decode_transformed_centered

    codes = np.array([[0, 1, 2, 3, 0, 1, 2, 3]], dtype=np.uint8)
    packed = bitcodec.pack_codes(codes)
    out = np.asarray(_decode_transformed_centered(jnp.asarray(packed), 8, "dom"))[0]
    # observed dom indicator: 0,1,1,-,0,1,1,- -> mean 2/3
    exp_obs = np.array([0, 1, 1, 0, 1, 1]) - 2.0 / 3.0
    np.testing.assert_allclose(out[[0, 1, 2, 4, 5, 6]], exp_obs, atol=1e-6)
    np.testing.assert_allclose(out[[3, 7]], 0.0, atol=1e-6)  # missing -> 0
    out_rec = np.asarray(_decode_transformed_centered(jnp.asarray(packed), 8, "rec"))[0]
    exp_rec = np.array([0, 0, 1, 0, 0, 1]) - 1.0 / 3.0
    np.testing.assert_allclose(out_rec[[0, 1, 2, 4, 5, 6]], exp_rec, atol=1e-6)
    np.testing.assert_allclose(out_rec[[3, 7]], 0.0, atol=1e-6)


def test_lowrank_ld_pruned_selection(lr_problem):
    from janusx_tpu.models.fastlmm import (
        lowrank_basis_from_snps,
        select_kinship_snps_ld,
    )

    pg, lrb, basis, cov, y = lr_problem
    idx = select_kinship_snps_ld(pg, 48)
    assert 0 < len(idx) <= 48
    assert len(np.unique(idx)) == len(idx)
    lrb2 = lowrank_basis_from_snps(pg, q=48, ld_prune=True)
    assert lrb2.k <= 48
    res, null = fastlmm_scan(pg, lrb2, y, cov, block=128)
    assert np.isfinite(res.pwald[np.isfinite(res.beta)]).all()
