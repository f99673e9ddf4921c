"""Simulator tests: family structure, dominance, epistasis gates,
background polygenics (reference src/sim/g2p.rs feature surface)."""

import numpy as np
import pytest

from janusx_tpu.models.sim import (
    _gate_value,
    simulate_genotypes,
    simulate_phenotype,
)


def test_family_structure_raises_kinship():
    from janusx_tpu.io.packed import QcParams, pack_genotypes
    from janusx_tpu.models.grm import grm_from_packed

    n, m = 240, 800
    gd_u = simulate_genotypes(n, m, seed=1, structure="unrelated")
    gd_f = simulate_genotypes(n, m, seed=1, structure="family", family_size=6)
    assert gd_f.genotypes.shape == (m, n)
    Ku = grm_from_packed(pack_genotypes(gd_u, QcParams(maf=0.01)))
    Kf = grm_from_packed(pack_genotypes(gd_f, QcParams(maf=0.01)))
    iu = np.triu_indices(n, k=1)
    # families create a heavy tail of high off-diagonal kinship (~0.25-0.5)
    assert np.quantile(Kf[iu], 0.99) > np.quantile(Ku[iu], 0.99) + 0.15
    # within the first family block, relatedness is high
    fam = Kf[:6, :6][np.triu_indices(6, k=1)]
    assert fam.mean() > 0.2


def test_mixed_structure_sample_count():
    gd = simulate_genotypes(100, 50, seed=2, structure="mixed",
                            family_size=5, family_frac=0.5)
    assert gd.n == 100


def test_gate_values():
    a = np.array([1, 1, 0, 0], np.int8)
    b = np.array([1, 0, 1, 0], np.int8)
    assert list(_gate_value("A", a, b)) == [1, 0, 0, 0]
    assert list(_gate_value("NA", a, b)) == [0, 0, 1, 0]
    assert list(_gate_value("AN", a, b)) == [0, 1, 0, 0]
    assert list(_gate_value("NAN", a, b)) == [0, 0, 0, 1]
    assert list(_gate_value("X", a, b)) == [0, 1, 1, 0]


def test_phenotype_component_partition():
    gd = simulate_genotypes(500, 600, seed=3)
    sim = simulate_phenotype(
        gd, n_qtl=30, h2=0.6, dominance_pve=0.1, epistasis_pairs=3,
        epistasis_pve=0.1, bg_pve=0.1, seed=3,
    )
    assert sim.components["additive"] == pytest.approx(0.3)
    assert len(sim.epi_pairs) == 3
    assert sim.dom_effects is not None and len(sim.dom_effects) == 30
    y = sim.phenotypes[:, 0]
    # components are scaled to absolute variances summing to h2 and
    # ve = (1-h2), so total variance ~ 1 (up to component covariance)
    assert 0.6 < np.var(y) < 1.6
    assert np.isfinite(y).all()


def test_pve_overcommit_raises():
    gd = simulate_genotypes(50, 60, seed=4)
    with pytest.raises(ValueError, match="exceed"):
        simulate_phenotype(gd, h2=0.5, dominance_pve=0.3, bg_pve=0.3, seed=4)


def test_epistasis_recoverable_by_garfield():
    from janusx_tpu.io.packed import QcParams, pack_genotypes
    from janusx_tpu.models.garfield import garfield_scan

    gd = simulate_genotypes(400, 120, seed=7, maf_low=0.25)
    sim = simulate_phenotype(
        gd, n_qtl=0, h2=0.6, epistasis_pairs=1, epistasis_pve=0.6,
        epistasis_gate="A", seed=7,
    )
    i, j, gate, _ = sim.epi_pairs[0]
    pg = pack_genotypes(gd, QcParams(maf=0.0, geno=1.0))
    res = garfield_scan(pg, sim.phenotypes[:, 0], depth=2, beam=64,
                        n_perm=25, seed=1)
    assert set(res.rules[0].snps) == {i, j}


def test_geometric_and_equal_effect_models():
    gd = simulate_genotypes(120, 200, seed=8)
    s_eq = simulate_phenotype(gd, n_qtl=10, effect_model="equal", seed=8)
    assert set(np.abs(s_eq.qtl_effects)) == {1.0}
    s_geo = simulate_phenotype(gd, n_qtl=10, effect_model="geometric", seed=8)
    mags = np.abs(s_geo.qtl_effects)
    np.testing.assert_allclose(mags, 0.9 ** np.arange(10), rtol=1e-12)


def test_sim_cli_outputs(tmp_path):
    from janusx_tpu.cli.sim import main

    out = str(tmp_path / "s")
    rc = main([
        "-nind", "80", "-nsnp", "300", "-nqtl", "10", "-h2", "0.5",
        "-structure", "mixed", "-dom-pve", "0.1", "-epi-pairs", "2",
        "-epi-pve", "0.1", "-gate", "X", "-bg-pve", "0.1", "-o", out,
    ])
    assert rc == 0
    import os
    import json

    base = out + "/sim" if os.path.isdir(out) else out
    for ext in (".bed", ".pheno", ".qtl.tsv", ".sim.json"):
        assert os.path.exists(base + ext), base + ext
    comp = json.load(open(base + ".sim.json"))["components"]
    assert comp["epistasis"] == pytest.approx(0.1)
    lines = open(base + ".qtl.tsv").read().strip().split("\n")
    kinds = {ln.split("\t")[-1] for ln in lines[1:]}
    assert {"additive", "dominance"} <= kinds
    assert any(k.startswith("epistasis[X]") for k in kinds)


def test_sim_g2p_from_existing_genotypes(tmp_path):
    """g2p mode: phenotypes from an existing panel with causal controls
    (reference script/simulation.py -causal/-lmaf/-bimrange/-gff)."""
    import os

    from janusx_tpu.cli.main import main as jx_main
    from janusx_tpu.io import plink
    from janusx_tpu.models.sim import simulate_genotypes

    gd = simulate_genotypes(60, 400, n_chrom=2, seed=9)
    prefix = str(tmp_path / "p")
    plink.write_plink_genotypes(prefix, gd)
    pos_on_1 = gd.sites.pos[np.asarray(gd.sites.chrom, dtype=object) == "1"]
    lo, hi = int(pos_on_1.min()), int(np.median(pos_on_1))
    rc = jx_main([
        "sim", "-bfile", prefix, "-causal", "8", "-h2", "0.7",
        "-lmaf", "0.05", "-bimrange", f"1:{lo}:{hi}",
        "-o", str(tmp_path), "-prefix", "g2p", "-seed", "1",
    ])
    assert rc == 0
    assert not os.path.exists(str(tmp_path / "g2p.bed"))  # no genotype rewrite
    rows = [l.split("\t") for l in open(tmp_path / "g2p.qtl.tsv").readlines()[1:]]
    assert 0 < len(rows) <= 8
    assert all(r[1] == "1" and lo <= int(r[2]) <= hi for r in rows)
    ph = open(tmp_path / "g2p.pheno").readlines()
    assert len(ph) == 1 + 60


def test_logic_gate_mixed_sampler():
    """-logic-gate MODE WEIGHTS (reference simulation.py:1798): term sizes
    follow the weights, gates are real logic terms, -cs-pve controls the
    causal-block PVE, --pure-epistasis-only residualizes members."""
    from janusx_tpu.models.sim import simulate_genotypes, simulate_phenotype

    gd = simulate_genotypes(400, 600, seed=3, maf_low=0.25)
    sim = simulate_phenotype(
        gd, n_qtl=30, h2=0.6, seed=3,
        logic_terms=("r", [2.0, 1.0]), cs_pve=0.5,
    )
    terms = sim.components["logic_terms"]
    assert len(terms) >= 25  # a few degenerate gates may be dropped
    sizes = {len(t["members"]) for t in terms}
    assert sizes == {1, 2}
    assert sim.components["causal_terms"] == 0.5
    # additive size-1 members land in qtl_idx; gates in epi_pairs
    assert len(sim.qtl_idx) == sum(1 for t in terms if t["gate"] == "ADD")
    assert len(sim.epi_pairs) == sum(1 for t in terms if t["gate"] != "ADD")
    gates = {t["gate"] for t in terms if t["gate"] != "ADD"}
    assert gates <= {"A", "NA", "AN", "NAN", "X"}
    assert np.isfinite(sim.phenotypes).all()

    # pure epistasis: gate terms residualized against member dosages ->
    # members carry ~zero fitted marginal effect of the gate block
    sim2 = simulate_phenotype(
        gd, n_qtl=10, h2=0.6, seed=4,
        logic_terms=("a", [0.0, 1.0]), cs_pve=0.5, pure_epistasis=True,
    )
    assert len(sim2.qtl_idx) == 0  # no size-1 terms with weight 0
    assert all(len(t["members"]) == 2 for t in sim2.components["logic_terms"])


def test_sim_cli_logic_and_ldms_flags(tmp_path):
    import pandas as pd

    from janusx_tpu.cli.main import main as jx_main

    # base genotypes to drive g2p mode
    rc = jx_main(["sim", "-nind", "120", "-nsnp", "400", "-o", str(tmp_path),
                  "-prefix", "base"])
    assert rc == 0
    base = str(tmp_path / "base")
    # g2p with the logic-gate sampler
    rc = jx_main(["sim", "-bfile", base, "-causal", "12", "-h2", "0.5",
                  "-logic-gate", "r", "2,1", "-cs-pve", "0.4",
                  "--pure-epistasis-only", "-o", str(tmp_path),
                  "-prefix", "g2p"])
    assert rc == 0
    assert (tmp_path / "g2p.pheno").exists()
    qtl = pd.read_csv(tmp_path / "g2p.qtl.tsv", sep="\t")
    assert len(qtl) >= 1
    # LDMS causal filters: freq table keeps only high-MAF sites
    bim = pd.read_csv(base + ".bim", sep="\t", header=None,
                      names=["chr", "snp", "cm", "pos", "a1", "a0"])
    freq = pd.DataFrame({"chr": bim["chr"], "pos": bim["pos"],
                         "maf": np.linspace(0.01, 0.5, len(bim))})
    fpath = tmp_path / "freq.tsv"
    freq.to_csv(fpath, sep="\t", index=False)
    rc = jx_main(["sim", "-bfile", base, "-causal", "5", "-h2", "0.5",
                  "--causal-freq", str(fpath), "--causal-maf-quantile",
                  "0.8", "--causal-spacing-bp", "1",
                  "-o", str(tmp_path), "-prefix", "ldms"])
    assert rc == 0
    qtl2 = pd.read_csv(tmp_path / "ldms.qtl.tsv", sep="\t")
    # causal sites restricted to the top-20% MAF rows of the table
    thr = np.quantile(freq["maf"], 0.8)
    eligible = set(bim.loc[freq["maf"] >= thr, "snp"])
    assert set(qtl2["snp"]) <= eligible
