"""End-to-end GWAS workflow smoke tests (toy data, CPU)."""

import json
import os

import numpy as np
import pytest

from janusx_tpu.io import plink
from janusx_tpu.workflows.gwas import GwasConfig, run_gwas


@pytest.fixture
def toy_dataset(toy_genotypes, tmp_path):
    # local seeded rng: the 'noise' trait's LMM->LM switch assertion needs
    # a draw that is deterministic regardless of test execution order
    rng = np.random.default_rng(20260817)
    prefix = str(tmp_path / "toy")
    plink.write_plink_genotypes(prefix, toy_genotypes)
    # simulate 2 traits: one polygenic (mixed model), one with missing values
    g = toy_genotypes.genotypes.astype(float)
    g[g < 0] = np.nan
    gz = np.nan_to_num(g - np.nanmean(g, axis=1, keepdims=True))
    n = toy_genotypes.n
    u = gz[::3].T @ rng.normal(size=len(gz[::3])) * 0.1
    y1 = u + rng.normal(size=n)
    y2 = rng.normal(size=n)
    y2[:10] = np.nan
    pheno = tmp_path / "toy.pheno"
    with open(pheno, "wt") as fh:
        fh.write("\tpoly\tnoise\n")
        for i, s in enumerate(toy_genotypes.samples):
            v2 = "NA" if np.isnan(y2[i]) else f"{y2[i]:.6f}"
            fh.write(f"{s}\t{y1[i]:.6f}\t{v2}\n")
    return prefix, str(pheno)


def test_run_gwas_lmm(toy_dataset, tmp_path):
    prefix, pheno = toy_dataset
    out = str(tmp_path / "out" / "run1")
    cfg = GwasConfig(
        genotype=prefix, phenotype=pheno, out_prefix=out,
        models=("lmm",), block=128, force_model=True,
    )
    runs = run_gwas(cfg)
    assert len(runs) == 2
    for r in runs:
        assert r.model == "lmm"
        assert os.path.exists(r.tsv_path)
        assert r.result.m == r.n_snps
        assert np.all((r.result.pwald > 0) & (r.result.pwald <= 1))
    # second trait had 10 missing -> smaller n
    assert runs[1].n_samples == runs[0].n_samples - 10
    assert os.path.exists(out + ".gwas.summary.json")
    with open(out + ".gwas.summary.json") as fh:
        summary = json.load(fh)
    assert len(summary["runs"]) == 2


def test_run_gwas_switch_to_lm(toy_dataset, tmp_path):
    prefix, pheno = toy_dataset
    out = str(tmp_path / "out2" / "run")
    cfg = GwasConfig(
        genotype=prefix, phenotype=pheno, out_prefix=out,
        models=("lmm",), traits=["noise"], block=128, force_model=False,
    )
    runs = run_gwas(cfg)
    assert len(runs) == 1
    # pure-noise trait: expect the LMM->LM auto-switch to trigger
    assert runs[0].model == "lm"
    assert runs[0].requested_model == "lmm"
    assert runs[0].switch_lrt_p is not None and runs[0].switch_lrt_p >= 0.05


def test_run_gwas_multi_model(toy_dataset, tmp_path):
    prefix, pheno = toy_dataset
    out = str(tmp_path / "out3" / "run")
    cfg = GwasConfig(
        genotype=prefix, phenotype=pheno, out_prefix=out,
        models=("lm", "fvlmm", "lmm2"), traits=["poly"], block=128,
        force_model=True,
    )
    runs = run_gwas(cfg)
    assert [r.model for r in runs] == ["lm", "fvlmm", "lmm2"]
    lmm2 = runs[2].result
    assert lmm2.lbd is not None and lmm2.ml is not None and lmm2.plrt is not None


def test_global_stats_mode(tmp_path):
    """-global reuses full-sample row stats for trait subsets (reference
    workflow.py:6895): stats match the full prepare, and the scan runs."""
    import numpy as np
    import pandas as pd

    from janusx_tpu.cli.sim import main as sim_main
    from janusx_tpu.workflows.gwas import GwasConfig, run_gwas

    out = str(tmp_path / "d")
    assert sim_main(["-nind", "150", "-nsnp", "250", "-nqtl", "3",
                     "-h2", "0.6", "-o", out]) == 0
    base = os.path.join(out, "sim")
    # blank some phenotypes so the trait subset != full set
    ph = pd.read_csv(base + ".pheno", sep="\t")
    ph.iloc[-30:, 1] = np.nan
    ph.to_csv(base + ".pheno", sep="\t", index=False)
    common = dict(
        genotype=base + ".bed", phenotype=base + ".pheno",
        models=("lm",), traits=[0], force_model=True, use_cache=False,
        n_devices=1, write_tsv=False,
    )
    runs_strict = run_gwas(GwasConfig(out_prefix=str(tmp_path / "a"), **common))
    runs_glob = run_gwas(GwasConfig(out_prefix=str(tmp_path / "b"),
                                    global_stats=True, **common))
    rs, rg = runs_strict[0], runs_glob[0]
    assert rg.n_samples == rs.n_samples == 120
    # global mode keeps the FULL-set af (subset af differs in general)
    assert rg.result.m >= rs.result.m  # no subset-level QC drop in global
    ok = np.isfinite(rs.result.pwald) & np.isfinite(rg.result.pwald[:rs.result.m])
    # p-values close but not necessarily identical (stats source differs)
    lp_s = -np.log10(np.clip(rs.result.pwald[ok], 1e-300, 1))
    lp_g = -np.log10(np.clip(rg.result.pwald[:rs.result.m][ok], 1e-300, 1))
    assert np.median(np.abs(lp_s - lp_g)) < 0.5


def test_run_gwas_bimrange_and_trait_level(toy_dataset, tmp_path):
    """-bimrange restricts only the scan; -trait-level adds a combined TSV."""
    prefix, pheno = toy_dataset
    out = str(tmp_path / "rng" / "run")
    cfg = GwasConfig(
        genotype=prefix, phenotype=pheno, out_prefix=out,
        models=("lm",), force_model=True, block=128, use_cache=False,
        scan_ranges=("1:0.001-0.01",), trait_level=True,
    )
    runs = run_gwas(cfg)
    import pandas as pd

    for r in runs:
        t = pd.read_csv(r.tsv_path, sep="\t")
        assert set(t["chrom"].astype(str)) == {"1"}
        assert t["pos"].max() <= 10_000
        # full-panel chrom 1 spans positions 100..15000: restriction is real
        assert 0 < len(t) < 150
    comb = open(out + ".traitlevel.assoc.tsv").readlines()
    assert comb[0].startswith("trait\tmodel\tchrom")
    assert len(comb) - 1 == sum(
        len(pd.read_csv(r.tsv_path, sep="\t")) for r in runs)


def test_run_gwas_spk_precomputed(toy_dataset, tmp_path):
    """-spk path: the splmm route consumes a precomputed .spgrm."""
    import scipy.sparse

    from janusx_tpu.io import plink
    from janusx_tpu.io.jxgrm import write_jxgrm
    from janusx_tpu.io.packed import QcParams, pack_genotypes
    from janusx_tpu.models.grm import grm_from_packed
    from janusx_tpu.models.splmm import sparsify_grm

    prefix, pheno = toy_dataset
    gd = plink.read_plink(prefix)
    pg = pack_genotypes(gd, QcParams())
    K = grm_from_packed(pg)
    spgrm = str(tmp_path / "k.spgrm")
    write_jxgrm(spgrm, sparsify_grm(K, 0.05).tocsc())
    out = str(tmp_path / "spk" / "run")
    cfg = GwasConfig(
        genotype=prefix, phenotype=pheno, out_prefix=out,
        models=("splmm",), traits=["poly"], force_model=True, block=128,
        use_cache=False, sparse_grm=spgrm,
    )
    runs = run_gwas(cfg)
    assert len(runs) == 1
    assert np.isfinite(runs[0].result.pwald).all()


def test_run_gwas_trait_level_lm_batch(toy_dataset, tmp_path):
    """-trait-level batches same-mask lm traits into one dispatch with
    per-trait-identical numerics."""
    import pandas as pd

    prefix, pheno = toy_dataset
    # extend the pheno table with two extra fully-observed traits
    df = pd.read_csv(pheno, sep="\t", index_col=0)
    rng = np.random.default_rng(99)
    df["x1"] = rng.normal(size=len(df))
    df["x2"] = rng.normal(size=len(df))
    ph2 = str(tmp_path / "multi.pheno")
    df.to_csv(ph2, sep="\t")
    common = dict(genotype=prefix, phenotype=ph2, models=("lm", "lmm", "fvlmm"),
                  traits=["poly", "x1", "x2"], force_model=True, block=128,
                  use_cache=False)
    r_batch = run_gwas(GwasConfig(out_prefix=str(tmp_path / "b"),
                                  trait_level=True, **common))
    r_single = run_gwas(GwasConfig(out_prefix=str(tmp_path / "s"), **common))
    assert len(r_batch) == len(r_single) == 9
    for a, b in zip(r_batch, r_single):
        assert (a.trait, a.model) == (b.trait, b.model)
        da = -np.log10(a.result.pwald)
        db = -np.log10(b.result.pwald)
        np.testing.assert_allclose(da, db, atol=5e-3)
        if a.lambda_null is not None:
            assert a.lambda_null == pytest.approx(b.lambda_null, rel=1e-6)
    assert (tmp_path / "b.traitlevel.assoc.tsv").exists()
    # switch-aware batching: without force_model the noise traits switch
    # to lm and must match the unbatched run's routing
    common2 = dict(common, force_model=False, models=("lmm",))
    rb2 = run_gwas(GwasConfig(out_prefix=str(tmp_path / "b2"),
                              trait_level=True, **common2))
    rs2 = run_gwas(GwasConfig(out_prefix=str(tmp_path / "s2"), **common2))
    for a, b in zip(rb2, rs2):
        assert (a.trait, a.model) == (b.trait, b.model)
        np.testing.assert_allclose(-np.log10(a.result.pwald),
                                   -np.log10(b.result.pwald), atol=5e-3)


def test_pc_covariate_cache(toy_dataset, tmp_path):
    """-q PCs cache to the reference-named {...}.cGRM.pc{q}.txt and reload."""
    import glob
    import shutil

    prefix, pheno = toy_dataset
    cfg = dict(genotype=prefix, phenotype=pheno, models=("lm",),
               traits=["poly"], n_pcs=2, force_model=True, block=128)
    r1 = run_gwas(GwasConfig(out_prefix=str(tmp_path / "c1"), **cfg))
    pc_files = glob.glob(os.path.dirname(prefix) + "/*.cGRM.pc2.txt")
    assert pc_files, "PCA-Q cache file missing"
    rows = [l.split("\t") for l in open(pc_files[0])]
    assert len(rows[0]) == 3  # id + 2 PCs
    r2 = run_gwas(GwasConfig(out_prefix=str(tmp_path / "c2"), **cfg))
    # second run reads the %.8g text cache: identical to rounding noise
    np.testing.assert_allclose(r2[0].result.pwald, r1[0].result.pwald,
                               rtol=1e-4, atol=1e-9)
