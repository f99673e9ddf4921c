"""Haplotype plot stats + gene-model track tests (reference
bioplotkit/haplotype.py, geneplot.py)."""

import os

import numpy as np
import pytest

from janusx_tpu.plots.haplotype import (
    HaplotypeGroups,
    compact_letters,
    haplotype_groups,
    holm_adjust,
    plot_haplotype,
    tukey_hsd_pvalues,
    wilson_ci,
)


def test_haplotype_grouping_and_labels():
    g = np.array([[0, 0, 2, 2, 1, 0, 2, 0], [2, 2, 0, 0, 1, 2, 0, 2]], np.int8)
    hg = haplotype_groups(g, alleles=[("A", "G"), ("C", "T")], min_group=2)
    assert hg.names[0] in ("AA|TT", "GG|CC")
    # two groups of >= 2; the single het sample is dropped
    assert sorted(hg.counts.tolist(), reverse=True) == [4, 3]
    assert (hg.codes == -1).sum() == 1


def test_tukey_matches_scipy_tukey_hsd():
    rng = np.random.default_rng(0)
    groups = [rng.normal(0, 1, 30), rng.normal(0.8, 1, 25), rng.normal(0.1, 1, 40)]
    P = tukey_hsd_pvalues(groups)
    from scipy.stats import tukey_hsd

    ref = tukey_hsd(*groups)
    for i in range(3):
        for j in range(3):
            if i != j:
                assert P[i, j] == pytest.approx(ref.pvalue[i, j], abs=1e-6)


def test_compact_letters():
    # group 1 differs from 0 and 2; 0 and 2 indistinguishable
    P = np.array([[1.0, 0.01, 0.9], [0.01, 1.0, 0.02], [0.9, 0.02, 1.0]])
    letters = compact_letters(P)
    assert letters[0] == letters[2]
    assert letters[1] != letters[0]


def test_holm_and_wilson():
    adj = holm_adjust([0.01, 0.04, 0.03])
    assert adj[0] == pytest.approx(0.03)
    assert all(a <= 1.0 for a in adj)
    lo, hi = wilson_ci(8, 10)
    assert 0.4 < lo < 0.8 < hi <= 1.0
    assert wilson_ci(0, 0) == (0.0, 1.0)


def test_plot_haplotype_continuous_and_binomial(tmp_path):
    rng = np.random.default_rng(1)
    codes = np.repeat([0, 1, 2], 40)
    groups = HaplotypeGroups(
        codes=codes, names=["AA", "AG", "GG"], counts=np.array([40, 40, 40])
    )
    y = np.concatenate([
        rng.normal(0, 1, 40), rng.normal(1.2, 1, 40), rng.normal(2.4, 1, 40)
    ])
    out = str(tmp_path / "hap_cont.png")
    res = plot_haplotype(y, groups, out, mode="continuous")
    assert os.path.exists(out)
    assert res["test"] == "tukey_hsd"
    assert res["letters"][0] != res["letters"][2]
    yb = np.concatenate([
        rng.binomial(1, 0.1, 40), rng.binomial(1, 0.5, 40),
        rng.binomial(1, 0.9, 40),
    ]).astype(float)
    outb = str(tmp_path / "hap_bin.png")
    resb = plot_haplotype(yb, groups, outb, mode="binomial")
    assert os.path.exists(outb)
    assert resb["omnibus_p"] < 0.01
    assert resb["letters"][0] != resb["letters"][2]


GFF = """\
##gff-version 3
1\tsrc\tgene\t1000\t5000\t.\t+\t.\tID=gene1;Name=GENE_A
1\tsrc\tmRNA\t1000\t5000\t.\t+\t.\tID=m1;Parent=gene1
1\tsrc\texon\t1000\t1500\t.\t+\t.\tID=e1;Parent=m1
1\tsrc\texon\t3000\t3600\t.\t+\t.\tID=e2;Parent=m1
1\tsrc\texon\t4500\t5000\t.\t+\t.\tID=e3;Parent=m1
1\tsrc\tgene\t4200\t8000\t.\t-\t.\tID=gene2;Name=GENE_B
1\tsrc\texon\t4200\t4800\t.\t-\t.\tID=e4;Parent=gene2
1\tsrc\texon\t7500\t8000\t.\t-\t.\tID=e5;Parent=gene2
2\tsrc\tgene\t100\t900\t.\t+\t.\tID=gene3;Name=OFF_CHROM
"""


def test_gene_model_plot(tmp_path):
    from janusx_tpu.plots.geneplot import gene_model_plot, read_gene_models

    gff = str(tmp_path / "toy.gff3")
    open(gff, "wt").write(GFF)
    models = read_gene_models(gff, "1", 0, 10000)
    assert [m["name"] for m in models] == ["GENE_A", "GENE_B"]
    assert models[0]["exons"] == [(1000, 1500), (3000, 3600), (4500, 5000)]
    assert models[1]["exons"] == [(4200, 4800), (7500, 8000)]
    out = str(tmp_path / "region.png")
    rng = np.random.default_rng(2)
    pos = rng.integers(0, 10000, 200)
    nlp = rng.exponential(1.0, 200)
    n = gene_model_plot(gff, "1", 0, 10000, out, assoc=(pos, nlp),
                        sig_line=5.0, title="toy")
    assert n == 2 and os.path.exists(out)


def test_postgwas_hap_region_cli(tmp_path):
    from janusx_tpu.cli.postgwas import main as pg_main
    from janusx_tpu.cli.sim import main as sim_main

    out = str(tmp_path / "d")
    assert sim_main(["-nind", "150", "-nsnp", "400", "-nqtl", "5",
                     "-h2", "0.7", "-o", out]) == 0
    base = os.path.join(out, "sim")
    # fabricate an assoc TSV from sim positions
    import pandas as pd

    rng = np.random.default_rng(0)
    bim = pd.read_csv(base + ".bim", sep="\t", header=None,
                      names=["chrom", "snp", "cm", "pos", "a1", "a0"])
    df = pd.DataFrame({
        "chrom": bim["chrom"], "pos": bim["pos"],
        "pwald": rng.uniform(1e-8, 1, len(bim)),
    })
    assoc = str(tmp_path / "a.assoc.tsv")
    df.to_csv(assoc, sep="\t", index=False)
    gff = str(tmp_path / "toy.gff3")
    open(gff, "wt").write(
        "1\tsrc\tgene\t10000\t60000\t.\t+\t.\tID=g1;Name=G1\n"
    )
    snp = f"{bim['chrom'][0]}:{bim['pos'][0]}"
    rc = pg_main([
        "-i", assoc, "-gff", gff, "-region", "1:1-80000",
        "-hap", snp, "-p", base + ".pheno", "-bfile", base,
        "-o", str(tmp_path / "pg"),
    ])
    assert rc == 0
    outs = os.listdir(str(tmp_path / "pg"))
    assert any("region.1_1_80000" in f for f in outs)
    assert any(".hap." in f for f in outs)


def test_postgwas_autoregion_cli(tmp_path):
    from janusx_tpu.cli.postgwas import main as pg_main
    from janusx_tpu.cli.sim import main as sim_main

    out = str(tmp_path / "d")
    assert sim_main(["-nind", "120", "-nsnp", "300", "-nqtl", "3",
                     "-h2", "0.7", "-o", out]) == 0
    base = os.path.join(out, "sim")
    import pandas as pd

    rng = np.random.default_rng(1)
    bim = pd.read_csv(base + ".bim", sep="\t", header=None,
                      names=["chrom", "snp", "cm", "pos", "a1", "a0"])
    p = rng.uniform(1e-3, 1, len(bim))
    p[7] = 1e-12   # planted lead 1
    p[200] = 1e-9  # planted lead 2
    df = pd.DataFrame({
        "chrom": bim["chrom"], "pos": bim["pos"], "snp": bim["snp"],
        "pwald": p,
    })
    assoc = str(tmp_path / "a.assoc.tsv")
    df.to_csv(assoc, sep="\t", index=False)
    gff = str(tmp_path / "toy.gff3")
    pos7 = int(bim["pos"][7])
    open(gff, "wt").write(
        f"1\tsrc\tgene\t{max(pos7 - 5000, 1)}\t{pos7 + 5000}\t.\t+\t.\tID=g1;Name=NEAR_LEAD\n"
    )
    rc = pg_main([
        "-i", assoc, "-gff", gff, "-autoregion", "2",
        "-region-window", "100000", "-bfile", base,
        "-o", str(tmp_path / "pg"),
    ])
    assert rc == 0
    outs = os.listdir(str(tmp_path / "pg"))
    locus_files = [f for f in outs if ".locus." in f]
    assert len(locus_files) == 2
    # lead-1 report centered at the planted SNP
    assert any(f"1_{pos7}" in f for f in locus_files)


def test_pick_loci_independent():
    from janusx_tpu.plots.regionreport import pick_loci

    chrom = np.array(["1"] * 100 + ["2"] * 100)
    pos = np.concatenate([np.arange(100), np.arange(100)]) * 10_000
    p = np.ones(200)
    p[10] = 1e-10
    p[12] = 1e-9   # within window of 10 -> masked
    p[150] = 1e-8
    loci = pick_loci(chrom, pos, p, n_loci=5, window=50_000)
    assert loci == [("1", 100_000), ("2", 500_000)]


def test_postgwas_report_pdf(tmp_path):
    from janusx_tpu.cli.postgwas import main as pg_main
    from janusx_tpu.cli.sim import main as sim_main

    out = str(tmp_path / "d")
    assert sim_main(["-nind", "100", "-nsnp", "200", "-nqtl", "2",
                     "-h2", "0.6", "-o", out]) == 0
    base = os.path.join(out, "sim")
    import pandas as pd

    bim = pd.read_csv(base + ".bim", sep="\t", header=None,
                      names=["chrom", "snp", "cm", "pos", "a1", "a0"])
    rng = np.random.default_rng(5)
    p = rng.uniform(1e-3, 1, len(bim))
    p[11] = 1e-9
    pd.DataFrame({"chrom": bim["chrom"], "pos": bim["pos"],
                  "snp": bim["snp"], "pwald": p}).to_csv(
        str(tmp_path / "a.assoc.tsv"), sep="\t", index=False)
    rc = pg_main(["-i", str(tmp_path / "a.assoc.tsv"), "-autoregion", "1",
                  "-report", "-bfile", base, "-o", str(tmp_path / "pg")])
    assert rc == 0
    pdfs = [f for f in os.listdir(str(tmp_path / "pg")) if f.endswith(".report.pdf")]
    assert len(pdfs) == 1
    assert os.path.getsize(str(tmp_path / "pg" / pdfs[0])) > 10_000


def test_compact_letters_invariant():
    """CLD contract: groups share a letter IFF the pair is not significant
    (the greedy insert without absorb falsely separated NS pairs)."""
    import numpy as np

    from janusx_tpu.plots.haplotype import compact_letters

    P = np.ones((3, 3))
    P[1, 2] = P[2, 1] = 0.01
    assert compact_letters(P) == ["ab", "a", "b"]
    rng = np.random.default_rng(7)
    for _ in range(100):
        g = int(rng.integers(2, 7))
        P = np.ones((g, g))
        for i in range(g):
            for j in range(i + 1, g):
                P[i, j] = P[j, i] = rng.random()
        L = compact_letters(P, alpha=0.3)
        for i in range(g):
            for j in range(i + 1, g):
                assert bool(set(L[i]) & set(L[j])) == (P[i, j] >= 0.3)
