"""CLI end-to-end validation (ggval-style: simulate -> run modules ->
structural output checks; reference python/janusx/ggval.py)."""

import json
import os

import numpy as np
import pytest

from janusx_tpu.cli.main import main as jx_main


@pytest.fixture(scope="module")
def sim_dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("simdata")
    rc = jx_main(
        ["sim", "-nind", "300", "-nsnp", "800", "-nqtl", "20", "-h2", "0.6",
         "-o", str(out), "-prefix", "sim"]
    )
    assert rc == 0
    prefix = str(out / "sim")
    assert os.path.exists(prefix + ".bed")
    assert os.path.exists(prefix + ".pheno")
    return prefix


def test_cli_help():
    assert jx_main([]) == 0
    assert jx_main(["--version"]) == 0
    assert jx_main(["nosuchmodule"]) == 2


def test_cli_grm_pca(sim_dataset, tmp_path):
    rc = jx_main(["grm", "-bfile", sim_dataset, "-o", str(tmp_path), "-prefix", "g"])
    assert rc == 0
    K = np.load(str(tmp_path / "g.cGRM.npy"))
    assert K.shape == (300, 300)
    ids = open(str(tmp_path / "g.cGRM.id")).read().split()
    assert len(ids) == 300
    rc = jx_main(["pca", "-bfile", sim_dataset, "-dim", "5", "-o", str(tmp_path), "-prefix", "g"])
    assert rc == 0
    vecs = np.loadtxt(str(tmp_path / "g.eigenvec"), dtype=str)
    assert vecs.shape == (300, 6)
    vals = np.loadtxt(str(tmp_path / "g.eigenval"))
    assert len(vals) == 5 and np.all(np.diff(vals) <= 1e-12)
    # -k: decompose the saved GRM directly; must match genotype-route PCs
    rc = jx_main(["pca", "-k", str(tmp_path / "g.cGRM.npy"), "-dim", "5",
                  "-o", str(tmp_path), "-prefix", "k"])
    assert rc == 0
    v_g = np.loadtxt(str(tmp_path / "g.eigenvec"), dtype=str)[:, 1:].astype(float)
    v_k = np.loadtxt(str(tmp_path / "k.eigenvec"), dtype=str)[:, 1:].astype(float)
    for c in range(3):
        assert abs(np.corrcoef(v_g[:, c], v_k[:, c])[0, 1]) > 0.999
    # -c: visualization-only from existing results, with -group coloring
    grp = tmp_path / "groups.txt"
    grp.write_text("\n".join(f"{s}\tG{i % 2}" for i, s in
                             enumerate(np.loadtxt(str(tmp_path / "g.eigenvec"),
                                                  dtype=str)[:, 0])))
    rc = jx_main(["pca", "-c", str(tmp_path / "g"), "-group", str(grp),
                  "-palette", "red,blue", "-o", str(tmp_path), "-prefix", "viz"])
    assert rc == 0
    assert (tmp_path / "viz.pca.png").exists()
    assert (tmp_path / "viz.pca13.png").exists()


def test_cli_pca_rsvd_close_to_exact(tmp_path):
    # RSVD needs an eigengap: simulate 2 diverged subpopulations
    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo

    rng = np.random.default_rng(5)
    m, n = 600, 200
    p1 = rng.uniform(0.1, 0.9, m)
    p2 = np.clip(p1 + rng.normal(0, 0.25, m), 0.02, 0.98)
    g = np.concatenate(
        [
            rng.binomial(2, p1[:, None], (m, n // 2)),
            rng.binomial(2, p2[:, None], (m, n - n // 2)),
        ],
        axis=1,
    ).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object), pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object), allele1=np.array(["G"] * m, object),
    )
    prefix = str(tmp_path / "pop")
    plink.write_plink_genotypes(
        prefix, GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object))
    )
    rc = jx_main(["pca", "-bfile", prefix, "-dim", "2", "-approx", "-gk", "2",
                  "-o", str(tmp_path), "-prefix", "r"])
    assert rc == 0
    rc = jx_main(["pca", "-bfile", prefix, "-dim", "2", "-gk", "2",
                  "-o", str(tmp_path), "-prefix", "e"])
    assert rc == 0
    vr = np.loadtxt(str(tmp_path / "r.eigenval"))
    ve = np.loadtxt(str(tmp_path / "e.eigenval"))
    # leading (structure) eigenvalue matches tightly
    assert vr[0] == pytest.approx(ve[0], rel=1e-3)
    pr = np.loadtxt(str(tmp_path / "r.eigenvec"), dtype=str)[:, 1:].astype(float)
    pe = np.loadtxt(str(tmp_path / "e.eigenvec"), dtype=str)[:, 1:].astype(float)
    assert abs(np.corrcoef(pr[:, 0], pe[:, 0])[0, 1]) > 0.999


def test_cli_gwas_all_models(sim_dataset, tmp_path):
    rc = jx_main([
        "gwas", "-bfile", sim_dataset, "-p", sim_dataset + ".pheno",
        "-lm", "-lmm", "-fvlmm", "-splmm", "-farmcpu", "-force-model",
        "-o", str(tmp_path), "-prefix", "assoc",
    ])
    assert rc == 0
    expected_tags = ["LM", "LMM", "FvLMM", "SparseLMM", "FarmCPU"]
    for tag in expected_tags:
        path = str(tmp_path / f"assoc.trait0.{tag}.assoc.tsv")
        assert os.path.exists(path), tag
        with open(path) as fh:
            header = fh.readline().rstrip("\n").split("\t")
            nrows = sum(1 for _ in fh)
        assert header[:11] == [
            "chrom", "pos", "snp", "allele0", "allele1", "af", "miss",
            "beta", "se", "chisq", "pwald",
        ]
        assert nrows > 700
    summary = json.load(open(str(tmp_path / "assoc.gwas.summary.json")))
    assert len(summary["runs"]) == 5


def test_cli_postgwas(sim_dataset, tmp_path):
    rc = jx_main([
        "gwas", "-bfile", sim_dataset, "-p", sim_dataset + ".pheno",
        "-lm", "-o", str(tmp_path), "-prefix", "a",
    ])
    assert rc == 0
    tsv = str(tmp_path / "a.trait0.LM.assoc.tsv")
    rc = jx_main(["postgwas", "-i", tsv, "-o", str(tmp_path), "-prefix", "pg"])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "pg.a.trait0.LM.manhattan.png"))
    assert os.path.exists(str(tmp_path / "pg.a.trait0.LM.qq.png"))
    assert os.path.exists(str(tmp_path / "pg.a.trait0.LM.top.tsv"))


def test_cli_postgwas_style_flags(sim_dataset, tmp_path):
    """Reference panel selectors + cosmetics: -manh/-qq aspect ratios
    gate which panels render; -palette/-interval/-scatter-size/-alpha/
    -anno with a -bed interval source; hidden -full/-fontstyle accepted."""
    rc = jx_main([
        "gwas", "-bfile", sim_dataset, "-p", sim_dataset + ".pheno",
        "-lm", "-o", str(tmp_path), "-prefix", "s",
    ])
    assert rc == 0
    tsv = str(tmp_path / "s.trait0.LM.assoc.tsv")
    bed = tmp_path / "anno.bed"
    bed.write_text("1\t0\t99999999\tGeneZ\n")
    rc = jx_main([
        "postgwas", "-i", tsv, "-manh", "3/2", "-palette", "tab20",
        "-interval", "0.5", "-scatter-size", "2", "-alpha", "0.6",
        "-anno", "3", "-bed", str(bed), "-fontsize", "9",
        "-full", "-fontstyle", "DejaVu Sans",
        "-o", str(tmp_path), "-prefix", "sel",
    ])
    assert rc == 0
    # -manh given explicitly -> QQ panel skipped
    assert os.path.exists(str(tmp_path / "sel.s.trait0.LM.manhattan.png"))
    assert not os.path.exists(str(tmp_path / "sel.s.trait0.LM.qq.png"))
    import pandas as pd

    top = pd.read_csv(tmp_path / "sel.s.trait0.LM.top.tsv", sep="\t")
    assert "gene" in top.columns
    assert (top.loc[top["chrom"].astype(str) == "1", "gene"] == "GeneZ").all()
    # -qq alone -> Manhattan skipped
    rc = jx_main(["postgwas", "-i", tsv, "-qq", "-o", str(tmp_path),
                  "-prefix", "qo"])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "qo.s.trait0.LM.qq.png"))
    assert not os.path.exists(str(tmp_path / "qo.s.trait0.LM.manhattan.png"))


def test_gffindex_from_bed(tmp_path):
    from janusx_tpu.utils.gff import GffIndex

    bed = tmp_path / "x.bed"
    bed.write_text("# comment\nchr1\t100\t200\tA\nchr1 300 400 B\n"
                   "chr2,50,80\nbadline\n")
    gi = GffIndex.from_bed(str(bed))
    g, d = gi.nearest("chr1", 150)
    assert g.name == "A" and d == 0
    g, d = gi.nearest("chr1", 290)
    assert g.name == "B"
    g, _ = gi.nearest("chr2", 60)
    assert g.name == "chr2:50-80"  # unnamed interval gets a span label


def test_cli_gformat_roundtrip(sim_dataset, tmp_path):
    rc = jx_main([
        "gformat", "-bfile", sim_dataset, "-make-vcf", "-make-hmp", "-make-txt",
        "-maf", "0.0", "-geno", "1.0",
        "-o", str(tmp_path), "-prefix", "conv",
    ])
    assert rc == 0
    from janusx_tpu.io.gfreader import load_genotype_file
    from janusx_tpu.io import plink

    orig = plink.read_plink(sim_dataset)
    for path in ("conv.vcf.gz", "conv.hmp.txt", "conv.txt"):
        back = load_genotype_file(str(tmp_path / path))
        assert back.m == orig.m and back.n == orig.n
        # QC packing flips rows so allele1 is minor: compare allele-aware
        flipped = back.sites.allele1 != orig.sites.allele1
        if path == "conv.txt":
            # txt carries alleles via .bim sidecar; same check applies
            pass
        expect = orig.genotypes.copy()
        fl = np.asarray(flipped, bool)
        sub = expect[fl]
        sub[sub >= 0] = 2 - sub[sub >= 0]
        expect[fl] = sub
        np.testing.assert_array_equal(back.genotypes, expect)


def test_cli_gformat_prune(sim_dataset, tmp_path):
    rc = jx_main([
        "gformat", "-bfile", sim_dataset, "-make-bed",
        "--prune", "50", "5", "0.2",
        "-o", str(tmp_path), "-prefix", "pruned",
    ])
    assert rc == 0
    from janusx_tpu.io import plink

    pruned = plink.read_plink(str(tmp_path / "pruned"))
    assert 0 < pruned.m <= 800


def test_cli_gformat_filters(sim_dataset, tmp_path):
    """-keep / -extract / -chr / -from-bp/-to-bp / -snp-name / -fmt npy."""
    from janusx_tpu.io import plink

    orig = plink.read_plink(sim_dataset)
    keep = tmp_path / "keep.txt"
    keep.write_text("\n".join(str(s) for s in orig.samples[:37]))
    sites = tmp_path / "sites.txt"
    sites.write_text("\n".join(
        f"{orig.sites.chrom[i]}:{orig.sites.pos[i]}"
        for i in range(0, orig.m, 3)))
    rc = jx_main([
        "gformat", "-bfile", sim_dataset, "-keep", str(keep),
        "-extract", str(sites), "-snp-name", "chr_pos",
        "-fmt", "npy", "-o", str(tmp_path), "-prefix", "filt",
    ])
    assert rc == 0
    a = np.load(tmp_path / "filt.npy")
    n_sites = len(range(0, orig.m, 3))
    assert a.shape == (n_sites, 37)
    ids = (tmp_path / "filt.id").read_text().split()
    assert ids == [str(s) for s in orig.samples[:37]]
    hdr = (tmp_path / "filt.sites.tsv").read_text().splitlines()
    c0, p0 = hdr[1].split("\t")[0], hdr[1].split("\t")[1]
    assert hdr[1].split("\t")[2] == f"{c0}_{p0}"  # chr_pos template

    # chromosome + bp window
    chrom0 = str(orig.sites.chrom[0])
    on0 = np.asarray(orig.sites.chrom, dtype=object) == orig.sites.chrom[0]
    pos0 = orig.sites.pos[on0]
    lo, hi = int(pos0[2]), int(pos0[min(40, len(pos0) - 1)])
    rc = jx_main([
        "gformat", "-bfile", sim_dataset, "-chr", chrom0,
        "-from-bp", str(lo), "-to-bp", str(hi),
        "-fmt", "npy", "-o", str(tmp_path), "-prefix", "reg",
    ])
    assert rc == 0
    b = np.load(tmp_path / "reg.npy")
    expect_m = int(((pos0 >= lo) & (pos0 <= hi)).sum())
    assert b.shape[0] == expect_m

    # range-mode extract
    rng_file = tmp_path / "ranges.txt"
    rng_file.write_text(f"{chrom0} {lo} {hi}\n")
    rc = jx_main([
        "gformat", "-bfile", sim_dataset, "-extract", "range", str(rng_file),
        "-fmt", "npy", "-o", str(tmp_path), "-prefix", "rng",
    ])
    assert rc == 0
    assert np.load(tmp_path / "rng.npy").shape[0] == expect_m


def test_cli_gformat_prune_bp_window(tmp_path):
    """kb-suffixed prune windows drop duplicated (r2=1) nearby SNPs."""
    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo

    rng = np.random.default_rng(5)
    base = rng.integers(0, 3, size=(40, 120)).astype(np.int8)
    # each SNP duplicated at +1000 bp -> r2 = 1 within any >=1 kb window
    g = np.repeat(base, 2, axis=0)
    pos = np.repeat(np.arange(40) * 50_000, 2) + np.tile([0, 1000], 40)
    sites = SiteInfo(
        chrom=np.array(["1"] * 80, dtype=object),
        pos=pos,
        snp=np.array([f"s{i}" for i in range(80)], dtype=object),
        allele0=np.array(["A"] * 80, dtype=object),
        allele1=np.array(["G"] * 80, dtype=object),
    )
    gd = GenotypeData(g, sites, np.array([f"I{i}" for i in range(120)], dtype=object))
    plink.write_plink_genotypes(str(tmp_path / "dup"), gd)
    rc = jx_main([
        "gformat", "-bfile", str(tmp_path / "dup"), "-prune", "2kb", "1", "0.5",
        "-o", str(tmp_path), "-prefix", "pr",
    ])
    assert rc == 0
    pruned = plink.read_plink(str(tmp_path / "pr"))
    # one of each duplicate pair must go; far-apart pairs (50 kb) stay
    assert pruned.m == 40


def test_cli_gstats(sim_dataset, tmp_path):
    rc = jx_main(["gstats", "-bfile", sim_dataset, "-site", "-ind",
                  "-o", str(tmp_path), "-prefix", "st"])
    assert rc == 0
    site = open(str(tmp_path / "st.site.stats.tsv")).readlines()
    assert len(site) == 801
    ind = open(str(tmp_path / "st.ind.stats.tsv")).readlines()
    assert len(ind) == 301


def test_cli_gs(sim_dataset, tmp_path):
    # mask some phenotypes to create a test set
    import numpy as np

    lines = open(sim_dataset + ".pheno").readlines()
    masked = str(tmp_path / "masked.pheno")
    with open(masked, "wt") as fh:
        fh.write(lines[0])
        for i, ln in enumerate(lines[1:]):
            if i >= 270:
                parts = ln.split("\t")
                fh.write(parts[0] + "\tNA\n")
            else:
                fh.write(ln)
    rc = jx_main([
        "gs", "-bfile", sim_dataset, "-p", masked, "-BLUP", "-cv", "5",
        "-o", str(tmp_path), "-prefix", "gsout",
    ])
    assert rc == 0
    gebv = open(str(tmp_path / "gsout.trait0.gebv.tsv")).readlines()
    assert len(gebv) == 31  # header + 30 test samples
    assert os.path.exists(str(tmp_path / "gsout.gs.summary.json"))


def test_cli_gstats_reference_tables(sim_dataset, tmp_path):
    """-freq/-miss/-het/-ldsc reference table outputs (script/gstats.py)."""
    rc = jx_main([
        "gstats", "-bfile", sim_dataset, "-freq", "-miss", "-het",
        "-ldsc", "30kb", "-o", str(tmp_path), "-prefix", "st",
    ])
    assert rc == 0
    freq = [l.split("\t") for l in open(tmp_path / "st.freq")]
    assert freq[0] == ["chr", "pos", "maf\n"]
    vals = np.array([float(r[2]) for r in freq[1:]])
    assert len(vals) == 800 and np.all((vals >= 0) & (vals <= 0.5))
    assert (tmp_path / "st.freq.pdf").exists()
    imiss = open(tmp_path / "st.imiss").readlines()
    assert len(imiss) == 1 + 300
    assert (tmp_path / "st.lmiss").exists() and (tmp_path / "st.lhet").exists()
    assert (tmp_path / "st.ihet").exists()
    ldsc = open(tmp_path / "st.30kb.ldsc").readlines()
    assert len(ldsc) == 1 + 800
    assert all(float(l.split("\t")[2]) >= -1e-6 for l in ldsc[1:])
    # SNP-count window spelling
    rc = jx_main(["gstats", "-bfile", sim_dataset, "-ldsc", "25",
                  "-o", str(tmp_path), "-prefix", "sc"])
    assert rc == 0
    assert (tmp_path / "sc.25snp.ldsc").exists()


def test_cli_gstats_ldscore(sim_dataset, tmp_path):
    rc = jx_main(["gstats", "-bfile", sim_dataset, "-site", "-ldscore", "20",
                  "-o", str(tmp_path), "-prefix", "ls"])
    assert rc == 0
    lines = open(str(tmp_path / "ls.site.stats.tsv")).readlines()
    assert lines[0].rstrip("\n").split("\t")[-1] == "ldscore"
    vals = [float(l.split("\t")[-1]) for l in lines[1:]]
    assert all(v >= -1e-6 for v in vals)


def test_cli_benchmark_small(tmp_path):
    rc = jx_main(["benchmark", "-nind", "150", "-nsnp", "600",
                  "-modules", "grm,lm", "-repeats", "1",
                  "-o", str(tmp_path), "-prefix", "b"])
    assert rc == 0
    data = json.load(open(str(tmp_path / "b.benchmark.json")))
    assert {r["module"] for r in data["results"]} == {"grm", "lm_scan"}


def test_cli_splmm_exact(sim_dataset, tmp_path):
    rc = jx_main([
        "gwas", "-bfile", sim_dataset, "-p", sim_dataset + ".pheno",
        "-splmm-exact", "-force-model",
        "-o", str(tmp_path), "-prefix", "sx",
    ])
    assert rc == 0
    path = str(tmp_path / "sx.trait0.SparseLMM2.assoc.tsv")
    assert os.path.exists(path)
    with open(path) as fh:
        assert fh.readline().startswith("chrom\tpos")
        assert sum(1 for _ in fh) > 700


def test_cli_postgwas_ldblock(sim_dataset, tmp_path):
    rc = jx_main([
        "gwas", "-bfile", sim_dataset, "-p", sim_dataset + ".pheno",
        "-lm", "-o", str(tmp_path), "-prefix", "lb",
    ])
    assert rc == 0
    rc = jx_main([
        "postgwas", "-i", str(tmp_path / "lb.trait0.LM.assoc.tsv"),
        "-ldblock", "1:10000:999999".replace(":999999", "-999999"),
        "-bfile", sim_dataset, "-o", str(tmp_path), "-prefix", "pgl",
    ])
    assert rc == 0
    import glob as _g

    assert _g.glob(str(tmp_path / "pgl.ldblock.*.png"))
    # -ldblock-all: region from -bimrange, custom ramp palette + ratio
    rc = jx_main([
        "postgwas", "-i", str(tmp_path / "lb.trait0.LM.assoc.tsv"),
        "-ldblock-all", "2", "-ldblock-palette", "white;yellow;red",
        "-bimrange", "1:0.01-0.999999",
        "-bfile", sim_dataset, "-o", str(tmp_path), "-prefix", "pga",
    ])
    assert rc == 0
    assert _g.glob(str(tmp_path / "pga.ldblock.*.png"))


def test_cli_postgarfield(tmp_path):
    tsv = tmp_path / "g.tsv"
    tsv.write_text(
        "rule\tdepth\tsupport\tscore\tpperm\n"
        "s1 AND s2\t2\t12\t0.15\t0.02\n"
        "s3\t1\t40\t0.08\t0.3\n"
    )
    rc = jx_main(["postgarfield", "-i", str(tsv), "-o", str(tmp_path), "-prefix", "pgf"])
    assert rc == 0
    assert (tmp_path / "pgf.g.rules.png").exists()
    # arcs + circular Manhattan + endpoint annotation against a GWAS bg
    gwas = tmp_path / "bg.tsv"
    gwas.write_text(
        "chrom\tpos\tsnp\tpwald\n"
        + "\n".join(f"{c}\t{p * 1000}\ts{i}\t{0.5 / (i + 1)}"
                    for i, (c, p) in enumerate(
                        (c, p) for c in (1, 2) for p in range(1, 51)))
    )
    gff = tmp_path / "a.gff3"
    gff.write_text("##gff-version 3\n"
                   "1\tsrc\tgene\t1\t60000\t.\t+\t.\tID=gx;Name=GeneX\n")
    rc = jx_main(["postgarfield", "-i", str(tsv), "-gwasfile", str(gwas),
                  "-thr", "1e-3", "-circle", "-gff", str(gff),
                  "-o", str(tmp_path), "-prefix", "pga"])
    assert rc == 0
    assert (tmp_path / "pga.g.arcs.png").exists()
    assert (tmp_path / "pga.g.circle.png").exists()
    ep = (tmp_path / "pga.g.endpoints.tsv").read_text().splitlines()
    assert ep[0].startswith("rule\tendpoint")
    # endpoints s1/s2/s3 resolve to chrom/pos and a gene on chrom 1
    body = "\n".join(ep[1:])
    assert "s1" in body and "GeneX" in body


def test_bench_module_clis(tmp_path):
    """gblupbench/bayesbench/garfieldbench produce their JSON artifacts
    (reference: script/gblupbench.py, bayesbench.py, garfieldbench.py)."""
    import json
    import os

    from janusx_tpu.cli.benchmark import (
        bayesbench_main,
        garfieldbench_main,
        gblupbench_main,
    )

    out = str(tmp_path / "b")
    assert gblupbench_main(["-nind", "200", "-nsnp", "800", "-cv", "2",
                            "-o", out + "1"]) == 0
    g = json.load(open(os.path.join(out + "1", "gblupbench.gblupbench.json")))
    assert {r["route"] for r in g["routes"]} == {"GBLUP", "rrBLUP-PCG"}
    assert bayesbench_main(["-nind", "150", "-nsnp", "500", "-iters", "120",
                            "-burnin", "40", "-o", out + "2"]) == 0
    b = json.load(open(os.path.join(out + "2", "bayesbench.bayesbench.json")))
    assert len(b["methods"]) == 4
    assert garfieldbench_main(["-nind", "200", "-nsnp", "200", "-reps", "1",
                               "-o", out + "3"]) == 0
    from janusx_tpu.cli.main import _SUBENTRY

    for name in ("gblupbench", "bayesbench", "garfieldbench"):
        assert name in _SUBENTRY


def test_ggval_smoke(tmp_path):
    from janusx_tpu.cli.ggval import main as ggval_main

    rc = ggval_main(["gwas", "-nind", "120", "-nsnp", "300",
                     "-o", str(tmp_path)])
    assert rc == 0


def test_gstats_ldscore_chunk_boundaries(tmp_path):
    """Two-sided chunk overlap: sites at chunk edges keep their full
    left window (regression: left neighbors were dropped at s0)."""
    from janusx_tpu.cli.gstats import _site_ldscores
    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.io.gfreader import load_raw_packed
    from janusx_tpu.io.packed import QcParams, pack_from_codes

    rng = np.random.default_rng(3)
    m, n = 2400, 30  # spans the 2048-SNP chunk boundary
    g = rng.integers(0, 3, (m, n)).astype(np.int8)
    for i in range(1, m):  # plant LD with the previous site
        mask = rng.random(n) < 0.7
        g[i, mask] = g[i - 1, mask]
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(1, m + 1, dtype=np.int64) * 100,
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )
    prefix = str(tmp_path / "x")
    plink.write_plink_genotypes(
        prefix, GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object)))
    raw = load_raw_packed(prefix)
    win = 25
    ld = _site_ldscores(raw, "variants", win)
    pgq = pack_from_codes(raw.packed, raw.n_samples, raw.sites, raw.samples,
                          QcParams(maf=0.0, geno=1.0))
    d = pgq.dosages().astype(float)
    d[d < 0] = np.nan
    dc = np.nan_to_num(d - np.nanmean(d, axis=1, keepdims=True))
    Z = dc / np.maximum(np.sqrt((dc ** 2).sum(1)), 1e-12)[:, None]
    for gi in (0, 2047, 2048, 2049, 2399):
        lo, up = max(0, gi - win), min(pgq.m, gi + win + 1)
        want = float(((Z[lo:up] @ Z[gi]) ** 2).sum() - 1.0)
        assert ld[gi] == pytest.approx(want, abs=1e-3)


def test_cli_postgwas_merge_circle_clump(sim_dataset, tmp_path):
    """Reference postgwas surface: -manh-merge, -qq-merge, -circle,
    -LDclump, -thr alias, -bimrange filter, -fmt, column-name options."""
    rc = jx_main([
        "gwas", "-bfile", sim_dataset, "-p", sim_dataset + ".pheno",
        "-lm", "-lmm", "-force-model", "-o", str(tmp_path), "-prefix", "m",
    ])
    assert rc == 0
    t1 = str(tmp_path / "m.trait0.LM.assoc.tsv")
    t2 = str(tmp_path / "m.trait0.LMM.assoc.tsv")
    rc = jx_main([
        "postgwas", "-i", t1, t2, "-o", str(tmp_path), "-prefix", "pg2",
        "-manh-merge", "-qq-merge", "-circle", "-circle-in",
        "-fmt", "pdf", "-ylim", "8",
    ])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "pg2.manhattan.merge.pdf"))
    assert os.path.exists(str(tmp_path / "pg2.qq.merge.pdf"))
    assert os.path.exists(str(tmp_path / "pg2.circle.pdf"))

    # -interact chords on the circular panel (GARFIELD rules shape:
    # endpoints resolve through the assoc snp column), plus the circle
    # cosmetics and the -gwasfile input alias
    import pandas as pd

    snps = pd.read_csv(t1, sep="\t")["snp"].astype(str)
    rules = tmp_path / "rules.tsv"
    rules.write_text("rule\tscore\n"
                     f"{snps.iloc[3]} AND {snps.iloc[100]}\t0.5\n"
                     f"{snps.iloc[10]} XOR {snps.iloc[400]}\t0.4\n")
    rc = jx_main([
        "postgwas", "-gwasfile", t1, "-o", str(tmp_path), "-prefix", "pgi",
        "-circle", "-interact", str(rules), "-circle-interval", "0.8",
        "-circle-lw", "1.2",
    ])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "pgi.circle.png"))

    # LD clump with genotypes + loose threshold so clumps exist
    rc = jx_main([
        "postgwas", "-i", t1, "-bfile", sim_dataset,
        "-o", str(tmp_path), "-prefix", "pg3",
        "-LDclump", "100kb", "0.2", "-thr", "0.01",
    ])
    assert rc == 0
    clumped = str(tmp_path / "pg3.m.trait0.LM.clumped.tsv")
    assert os.path.exists(clumped)
    lines = open(clumped).read().splitlines()
    assert lines[0].split("\t") == [
        "chrom", "pos", "snp", "p", "n_members", "members"]
    assert len(lines) > 1
    # leads are mutually unclaimed: every member appears exactly once
    all_members = []
    for ln in lines[1:]:
        all_members += ln.split("\t")[5].split(";")
    assert len(all_members) == len(set(all_members))

    # -bimrange restricts the plotted rows; bogus range errors cleanly
    rc = jx_main([
        "postgwas", "-i", t1, "-o", str(tmp_path), "-prefix", "pg4",
        "-bimrange", "1:0-1000000",
    ])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "pg4.m.trait0.LM.manhattan.png"))


def test_bench_round4_extensions(tmp_path):
    """Round-4 bench-harness surfaces: benchmark farmcpu module with the
    raw-vs-unified --check, gblupbench --engines/--run-folds/--check,
    bayesbench multi-chain R-hat convergence."""
    import json
    import os

    from janusx_tpu.cli.benchmark import bayesbench_main, gblupbench_main
    from janusx_tpu.cli.benchmark import main as bench_main

    out = str(tmp_path / "r4")
    # farmcpu timing + internal parity check (reference script/benchmark.py)
    assert bench_main(["-nind", "200", "-nsnp", "600", "-modules", "farmcpu",
                       "--check", "--farmcpu-iter", "3", "--topk", "20",
                       "-o", out + "f"]) == 0
    d = json.load(open(os.path.join(out + "f", "bench.benchmark.json")))
    mods = {r["module"] for r in d["results"]}
    assert {"farmcpu", "farmcpu_check"} <= mods
    chk = next(r for r in d["results"] if r["module"] == "farmcpu_check")
    assert "overlap" in chk and chk["match"] == "exact"
    assert os.path.exists(os.path.join(out + "f", "bench.farmcpu.top20.tsv"))
    # gblupbench single engine + fold cap + cross-route check
    assert gblupbench_main(["-nind", "150", "-nsnp", "400", "-cv", "3",
                            "--run-folds", "1", "--engines",
                            "gblup,rrblup_pcg", "--check",
                            "-o", out + "g"]) == 0
    # bayesbench convergence: 2 chains, rhat present
    assert bayesbench_main(["-nind", "120", "-nsnp", "300", "-iters", "200",
                            "-burnin", "50", "--methods", "BayesA",
                            "--chains", "2", "-o", out + "b"]) == 0
    b = json.load(open(os.path.join(out + "b", "bayesbench.bayesbench.json")))
    row = next(r for r in b["methods"] if r["method"] == "BayesA")
    assert "rhat_mu" in row and "rhat_ve" in row
    assert row["rhat_mu"] == row["rhat_mu"]  # finite-ish (not NaN for 75 kept)
    assert "topk_concordance" in row
