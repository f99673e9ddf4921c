"""Golden regression test: mouse_hs1940 LMM results frozen at round 1.

Guards the full numeric pipeline (VCF parse -> QC -> GRM -> eigh -> null
REML -> grid scan -> Wald p) against silent regressions. Values were
cross-validated against an independent numpy/scipy implementation and
reproduce the reference's published sample/SNP accounting
(n=1410 train, EffSNPs ~8.96k, chr17 association region).
"""

import numpy as np
import pytest

EXPECTED_TOP = {
    # snp: -log10(pwald) at round-1 freeze
    "rs13482968": 15.77,
    "rs6249614": 15.57,
    "rs13459151": 15.05,
    "rs13482967": 14.97,
    "rs3705058": 14.94,
}
EXPECTED_LAMBDA_NULL = 0.6591
EXPECTED_N = 1410
EXPECTED_M = 8972


@pytest.fixture(scope="module")
def mouse_lmm(mouse_vcf, mouse_pheno):
    from janusx_tpu.core.spectral import eigh_grm
    from janusx_tpu.io.gfreader import load_raw_packed
    from janusx_tpu.io.packed import QcParams
    from janusx_tpu.io.pheno import load_phenotype
    from janusx_tpu.models.grm import grm_from_packed
    from janusx_tpu.models.lmm import lmm_scan
    from janusx_tpu.models.scan_common import analysis_sample_index

    raw = load_raw_packed(mouse_vcf)
    ph = load_phenotype(mouse_pheno)
    y_all, _ = ph.align(raw.samples)
    y = y_all[:, 0]
    keep = analysis_sample_index(y)
    pg_full = raw.prepare(QcParams())
    K = grm_from_packed(pg_full)
    pg = raw.prepare(QcParams(), sample_idx=keep)
    basis = eigh_grm(K[np.ix_(keep, keep)], diag_ridge=1e-6)
    res, null = lmm_scan(pg, basis, y[keep], block=2048)
    return pg, res, null, len(keep)


def test_mouse_accounting(mouse_lmm):
    pg, res, null, n = mouse_lmm
    assert n == EXPECTED_N
    assert pg.m == EXPECTED_M


def test_mouse_null_lambda(mouse_lmm):
    _, _, null, _ = mouse_lmm
    assert null.lbd == pytest.approx(EXPECTED_LAMBDA_NULL, abs=2e-3)


def test_mouse_top_hits_frozen(mouse_lmm):
    pg, res, _, _ = mouse_lmm
    lp = -np.log10(res.pwald)
    by_snp = {s: lp[i] for i, s in enumerate(pg.sites.snp)}
    for snp, expected in EXPECTED_TOP.items():
        assert by_snp[snp] == pytest.approx(expected, abs=0.05), snp
    # the chr17 region tops the scan
    top5 = set(pg.sites.snp[np.argsort(res.pwald)[:5]])
    assert top5 == set(EXPECTED_TOP)


def test_mouse_gs_blup_accuracy(mouse_vcf, mouse_pheno, tmp_path):
    """GS accuracy anchor vs the reference's published number: BLUP
    5-fold CV on mouse_hs1940 trait test0 gives Pearson r = 0.704 in the
    reference README (README.md:127); this pipeline lands at 0.705.
    Band [0.68, 0.73] tolerates fold-shuffle differences only."""
    from janusx_tpu.gs.workflow import GsConfig, run_gs

    cfg = GsConfig(
        genotype=mouse_vcf, phenotype=mouse_pheno,
        out_prefix=str(tmp_path / "gs"), methods=("BLUP",), traits=["test0"],
        cv=5,
    )
    results, summary = run_gs(cfg)
    res = results["test0"]["BLUP"]
    assert res.route == "GBLUP(add)"
    r = summary["traits"]["test0"]["BLUP"]["cv"]["pearson"]
    assert 0.68 <= r <= 0.73, f"mouse BLUP CV pearson {r} left the band"


def test_mouse_bayesa_accuracy(mouse_vcf, mouse_pheno, tmp_path):
    """BayesA accuracy anchor: reference README reports r = 0.709 on
    mouse_hs1940 test0 (README.md:128). Band tolerates MCMC seed noise."""
    from janusx_tpu.gs.workflow import GsConfig, run_gs

    cfg = GsConfig(
        genotype=mouse_vcf, phenotype=mouse_pheno,
        out_prefix=str(tmp_path / "gsb"), methods=("BayesA",),
        traits=["test0"], cv=5, write_outputs=False,
    )
    results, summary = run_gs(cfg)
    r = summary["traits"]["test0"]["BayesA"]["cv"]["pearson"]
    assert 0.67 <= r <= 0.74, f"mouse BayesA CV pearson {r} left the band"
