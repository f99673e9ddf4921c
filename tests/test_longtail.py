"""Tests for tree/BSA/gmerge/webui long-tail modules."""

import numpy as np
import pytest

from janusx_tpu.cli.main import main as jx_main
from janusx_tpu.io.gdata import GenotypeData, SiteInfo
from janusx_tpu.io.packed import QcParams, pack_genotypes


def _toy(rng, m=120, n=24, pops=True):
    p1 = rng.uniform(0.1, 0.9, m)
    if pops:
        p2 = np.clip(p1 + rng.choice([-1, 1], m) * 0.4, 0.02, 0.98)
        g = np.concatenate(
            [rng.binomial(2, p1[:, None], (m, n // 2)),
             rng.binomial(2, p2[:, None], (m, n - n // 2))], axis=1
        ).astype(np.int8)
    else:
        g = rng.binomial(2, p1[:, None], (m, n)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object), pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object), allele1=np.array(["G"] * m, object),
    )
    return GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object))


def test_ibs_distance_and_nj(rng):
    from janusx_tpu.models.tree import ibs_distance, neighbor_joining

    gd = _toy(rng)
    pg = pack_genotypes(gd, QcParams(maf=0.0, geno=1.0))
    D = ibs_distance(pg)
    # direct check on a few pairs
    d = pg.dosages().astype(float)
    d[d < 0] = np.nan
    for i, j in [(0, 1), (3, 20), (5, 23)]:
        ok = np.isfinite(d[:, i]) & np.isfinite(d[:, j])
        expect = np.mean(np.abs(d[ok, i] - d[ok, j])) / 2
        assert D[i, j] == pytest.approx(expect, abs=1e-6)
    # two-population structure -> within-pop distances smaller
    n2 = pg.n // 2
    within = (D[:n2, :n2].sum() + D[n2:, n2:].sum()) / (2 * n2 * (n2 - 1))
    between = D[:n2, n2:].mean()
    assert between > within
    nwk = neighbor_joining(D, pg.samples)
    assert nwk.endswith(";") and nwk.count("(") == pg.n - 1
    for s in pg.samples:
        assert str(s) in nwk


def test_bsa_analysis(rng):
    from janusx_tpu.models.bsa import bsa_analysis

    m = 500
    chrom = np.array(["1"] * m)
    pos = np.arange(1, m + 1) * 10_000
    depth = 40
    # causal region in the middle: bulks diverge
    p1 = np.full(m, 0.5)
    p2 = np.full(m, 0.5)
    p2[200:300] = 0.9
    alt1 = rng.binomial(depth, p1)
    alt2 = rng.binomial(depth, p2)
    res = bsa_analysis(chrom, pos, alt1, depth - alt1, alt2, depth - alt2,
                       window_bp=500_000)
    assert np.nanmean(np.abs(res.delta[200:300])) > np.nanmean(np.abs(res.delta[:150]))
    # sign convention: Delta.SNPindex = bulk2 - bulk1 (bsa.rs:226,282);
    # bulk2 is ALT-enriched in the causal window -> positive delta
    assert np.nanmean(res.delta[200:300]) > 0.2
    peak = np.nanargmax(res.g_prime)
    assert 150 <= peak <= 350


def test_bsa_filter_chain():
    from janusx_tpu.models.bsa import ed_statistic, filter_bulk_depths

    #        keep  dp1<15 gq1<90 totDP>300 both-low both-high keep
    dp1 = np.array([20.0, 5, 20, 20, 20, 20, 30])
    dp2 = np.array([20.0, 20, 20, 400, 20, 20, 30])
    ad1 = np.array([2.0, 10, 10, 10, 1, 19, 27])
    ad2 = np.array([18.0, 10, 10, 200, 1, 19, 3])
    gq1 = np.array([99.0, 99, 50, 99, 99, 99, 99])
    gq2 = np.full(7, 99.0)
    fr = filter_bulk_depths(dp1, ad1, dp2, ad2, gq1, gq2)
    np.testing.assert_array_equal(
        fr.keep, [True, False, False, False, False, False, True])
    # sequential stage audit mirrors the reference per-stage kept counts
    stages = {label: (b, a) for label, b, a in fr.stages}
    assert stages["bulk1.DP>=minDP(15)"] == (7, 6)
    assert stages["bulk1.GQ>=minGQ(90)"] == (6, 5)
    assert stages["totalDP<=max(300)"][1] == 4
    assert stages["refAlleleFreq(0.2)"][1] == 2
    # ED = sqrt(2)|i2-i1| (postbsa.py ED column)
    ed = ed_statistic(np.array([0.1, 0.5]), np.array([0.9, 0.5]))
    np.testing.assert_allclose(ed, [np.sqrt(2) * 0.8, 0.0], atol=1e-12)


def test_bsa_windows(rng):
    from janusx_tpu.models.bsa import bsa_analysis, bsa_windows

    m, depth = 400, 40
    chrom = np.array(["1"] * m)
    pos = np.arange(1, m + 1) * 10_000
    alt1 = rng.binomial(depth, 0.5, m)
    alt2 = rng.binomial(depth, 0.5, m)
    res = bsa_analysis(chrom, pos, alt1, depth - alt1, alt2, depth - alt2,
                       window_bp=200_000, gprime=False)
    win = bsa_windows(res, window_bp=200_000, step_bp=100_000, ed_power=4)
    assert len(win.center) > 10
    # centers start one step in and every window holds >= min_snps
    assert win.center[0] == pos[0] + 100_000
    assert (win.n_snps >= max(5, int(200_000 * 1e-4))).all()
    # brute-force one window's nan-means
    k = len(win.center) // 2
    c = win.center[k]
    sel = (pos >= c - 100_000) & (pos <= c + 100_000)
    assert win.n_snps[k] == sel.sum()
    np.testing.assert_allclose(win.delta[k], np.nanmean(res.delta[sel]),
                               rtol=1e-12)
    np.testing.assert_allclose(
        win.ed_power[k], np.nanmean(np.asarray(res.ed)[sel] ** 4), rtol=1e-12)
    # tricube G' at the center: heavier weight near the center
    d = np.abs(pos[sel] - c) / 100_000.0
    w = (1 - np.minimum(d, 1.0) ** 3) ** 3
    np.testing.assert_allclose(
        win.g_prime[k], np.sum(w * res.g_stat[sel]) / w.sum(), rtol=1e-10)
    # a chromosome shorter than one window is dropped entirely
    short = bsa_analysis(chrom[:5], pos[:5], alt1[:5], depth - alt1[:5],
                         alt2[:5], depth - alt2[:5], gprime=False)
    assert len(bsa_windows(short, window_bp=200_000).center) == 0


def test_bsa_prefix_mode_cli(rng, tmp_path):
    """Reference drop-in: caller tables with {bulk}.DP/.AD/.GQ columns
    through `jx bsa -b1/-b2` and the full `jx postbsa -b1/-b2` pipeline."""
    import pandas as pd

    from janusx_tpu.cli.bsa import main as bsa_main
    from janusx_tpu.cli.postbsa import main as postbsa_main

    # planted region kept small (<1% of loci) so the percentile
    # thresholds land in the null distribution, as on real data
    m, depth = 6000, 40
    p2 = np.full(m, 0.5)
    p2[250:300] = 1.0  # planted: bulk2 ALT-fixed at 2.5-3.0 Mb
    alt1 = rng.binomial(depth, 0.5, m)
    alt2 = rng.binomial(depth, p2)
    df = pd.DataFrame({
        "CHROM": ["1"] * m,
        "POS": np.arange(1, m + 1) * 10_000,
        "Bulk1.DP": depth, "Bulk1.GQ": 99,
        # AD as "ref,alt" strings: the parser takes the last comma field
        "Bulk1.AD": [f"{depth - a},{a}" for a in alt1],
        "Bulk2.DP": depth, "Bulk2.GQ": 99,
        "Bulk2.AD": [f"{depth - a},{a}" for a in alt2],
    })
    # a handful of rows the filter chain must drop
    df.loc[0, "Bulk1.DP"] = 5
    df.loc[1, "Bulk2.GQ"] = 10
    half = m // 2
    df.iloc[:half].to_csv(tmp_path / "part1.tsv", sep="\t", index=False)
    df.iloc[half:].to_csv(tmp_path / "part2.tsv", sep="\t", index=False)

    assert bsa_main(["-i", str(tmp_path / "part1.tsv"), "-b1", "Bulk1",
                     "-b2", "Bulk2", "-o", str(tmp_path), "-p", "pm",
                     "-win", "500000"]) == 0
    per_snp = pd.read_csv(tmp_path / "pm.bsa.tsv", sep="\t")
    assert "ED" in per_snp.columns
    assert len(per_snp) == half - 2  # the two planted bad rows dropped

    assert postbsa_main(["-i", str(tmp_path / "part*.tsv"), "-b1", "Bulk1",
                         "-b2", "Bulk2", "-o", str(tmp_path),
                         "-prefix", "pb", "-win", "500000",
                         "-ci", "95", "-ci", "99"]) == 0
    raw = pd.read_csv(tmp_path / "pb.raw.tsv", sep="\t")
    assert len(raw) == m - 2
    dname = "Delta.SNPindex(Bulk2-Bulk1)"
    for col in ("Bulk1.SNPindex", "Bulk2.SNPindex", dname, "ED", "G"):
        assert col in raw.columns
    smooth = pd.read_csv(tmp_path / "pb.smooth.tsv", sep="\t")
    assert {"n_snps", "ED_power", "Gprime"} <= set(smooth.columns)
    # the planted region carries the top smoothed delta
    peak = smooth.loc[smooth[dname].idxmax(), "pos"]
    assert 2_300_000 <= peak <= 3_200_000
    thr = pd.read_csv(tmp_path / "pb.thr.tsv", sep="\t")
    assert len(thr) > 0
    # the fully-planted window is "upper"; ED-triggered flanks whose
    # delta sits below the upper cut are labeled "lower" (reference
    # direction semantics, postbsa.py:1494-1500)
    top = thr.loc[thr["deltaSNPindex"].idxmax()]
    assert top["direction"] == "upper"
    mid = (thr["start"] + thr["end"]) / 2
    assert mid.between(2_000_000, 3_500_000).all()
    assert (tmp_path / "pb.stats.png").exists()
    assert (tmp_path / "pb.snpindex.png").exists()


def test_gmerge_cli(rng, tmp_path):
    from janusx_tpu.io import plink

    gd = _toy(rng, m=100, n=20, pops=False)
    a = gd.take_samples(np.arange(0, 12))
    b = gd.take_samples(np.arange(12, 20))
    # swap alleles in panel b for some sites (harmonization check)
    swap = np.arange(0, 100, 7)
    gb = b.genotypes.copy()
    sub = gb[swap]
    sub[sub >= 0] = 2 - sub[sub >= 0]
    gb[swap] = sub
    sites_b = b.sites.swap_alleles(np.isin(np.arange(100), swap))
    b2 = GenotypeData(gb, sites_b, b.samples)
    plink.write_plink_genotypes(str(tmp_path / "a"), a)
    plink.write_plink_genotypes(str(tmp_path / "b"), b2)
    rc = jx_main([
        "gmerge", "-bfile", str(tmp_path / "a"), str(tmp_path / "b"),
        "-fmt", "plink", "-o", str(tmp_path), "-prefix", "m",
    ])
    assert rc == 0
    merged = plink.read_plink(str(tmp_path / "m"))
    assert merged.n == 20 and merged.m == 100
    np.testing.assert_array_equal(merged.genotypes, gd.genotypes)
    # default vcf output + D{i}_ sample prefixes + post-merge maf filter
    rc = jx_main([
        "gmerge", "-i", str(tmp_path / "a"), str(tmp_path / "b"),
        "-sample-prefix", "-maf", "0.05",
        "-o", str(tmp_path), "-prefix", "mv",
    ])
    assert rc == 0
    from janusx_tpu.io.gfreader import load_genotype_file

    mv = load_genotype_file(str(tmp_path / "mv.vcf.gz"))
    assert mv.n == 20
    assert str(mv.samples[0]).startswith("D1_")
    assert str(mv.samples[12]).startswith("D2_")
    # maf filter dropped the monomorphic/rare sites (if any) but kept most
    g = gd.genotypes.astype(float)
    af = np.where(g >= 0, g, 0).sum(1) / (2.0 * (g >= 0).sum(1))
    expect_m = int((np.minimum(af, 1 - af) >= 0.05).sum())
    assert mv.m == expect_m


def test_tree_cli(rng, tmp_path):
    from janusx_tpu.io import plink

    gd = _toy(rng, m=80, n=12)
    plink.write_plink_genotypes(str(tmp_path / "t"), gd)
    rc = jx_main(["tree", "-bfile", str(tmp_path / "t"), "-dist",
                  "-maf", "0.0", "-geno", "1.0",
                  "-o", str(tmp_path), "-prefix", "tr"])
    assert rc == 0
    nwk = open(str(tmp_path / "tr.nwk")).read()
    assert nwk.strip().endswith(";")


def test_tree_bootstrap_fasta(tmp_path):
    """FASTA input, JC distances, bootstrap support: planted clades ~100%."""
    rng = np.random.default_rng(104)  # local: session rng is order-dependent
    base = rng.integers(0, 4, 400)
    with open(tmp_path / "aln.fa", "wt") as fh:
        for c in range(2):
            anc = base.copy()
            mut = rng.choice(400, 60, replace=False)
            anc[mut] = (anc[mut] + 1 + c) % 4
            for i in range(4):
                s = anc.copy()
                mm = rng.choice(400, 4, replace=False)
                s[mm] = rng.integers(0, 4, 4)
                fh.write(f">c{c}_{i}\n" + "".join("ACGT"[v] for v in s) + "\n")
    rc = jx_main(["tree", "-fa", str(tmp_path / "aln.fa"), "-b", "40",
                  "--write-phylip", "-o", str(tmp_path), "-prefix", "ft"])
    assert rc == 0
    import re

    nwk = open(tmp_path / "ft.nwk").read()
    supports = [int(x) for x in re.findall(r"\)(\d+):", nwk)]
    assert supports and max(supports) >= 95  # the clade split is certain
    ph = open(tmp_path / "ft.phylip.dist").readlines()
    assert ph[0].strip() == "8" and len(ph) == 9


def test_hybrid_view_refcheck_postgs(rng, tmp_path, capsys):
    from janusx_tpu.io import plink
    from janusx_tpu.models.sim import simulate_genotypes, simulate_phenotype, write_pheno

    gd = simulate_genotypes(60, 300, seed=4)
    sim = simulate_phenotype(gd, n_qtl=30, h2=0.7, seed=4)
    prefix = str(tmp_path / "h")
    plink.write_plink_genotypes(prefix, gd)
    write_pheno(prefix + ".pheno", gd.samples, sim.phenotypes)
    # hybrid
    rc = jx_main(["hybrid", "-bfile", prefix, "-p", prefix + ".pheno",
                  "-top", "0", "-o", str(tmp_path), "-prefix", "hy"])
    assert rc == 0
    lines = open(str(tmp_path / "hy.hybrid.tsv")).readlines()
    assert len(lines) == 1 + 60 * 59 // 2
    # -top limits the written crosses (default 50)
    rc = jx_main(["hybrid", "-bfile", prefix, "-p", prefix + ".pheno",
                  "-top", "5", "-o", str(tmp_path), "-prefix", "hy5"])
    assert rc == 0
    top5 = open(str(tmp_path / "hy5.hybrid.tsv")).readlines()
    assert len(top5) == 6
    # top-5 rows are the 5 best of the full table
    full = sorted((float(l.split()[2]) for l in lines[1:]), reverse=True)
    got = [float(l.split()[2]) for l in top5[1:]]
    assert got == sorted(got, reverse=True) and got[0] == full[0]
    # hybrid genotype BUILDER (reference hybrid.py parity): p1 x p2 crosses
    ids = [str(s) for s in gd.samples]
    (tmp_path / "p1.txt").write_text("\n".join(ids[:4]))
    (tmp_path / "p2.txt").write_text("\n".join(ids[4:7]))
    rc = jx_main(["hybrid", "-bfile", prefix, "-p1", str(tmp_path / "p1.txt"),
                  "-p2", str(tmp_path / "p2.txt"), "-fmt", "npy",
                  "-o", str(tmp_path), "-prefix", "hb"])
    assert rc == 0
    hyb = np.load(str(tmp_path / "hb.npy"))
    hyb_ids = open(str(tmp_path / "hb.id")).read().split()
    assert hyb.shape == (300, 12) and len(hyb_ids) == 12
    assert hyb_ids[0] == f"{ids[0]}@{ids[4]}"
    # dosages are parent means on the flipped (minor-allele) scale:
    # flip where the counted-allele frequency exceeds 0.5 (packed.py rule)
    g = gd.genotypes.astype(np.float32)
    flip = g.mean(axis=1) > 1.0
    g[flip] = 2 - g[flip]
    expect = 0.5 * (g[:, 0] + g[:, 4])
    np.testing.assert_allclose(hyb[:, 0], expect)
    # plink output rounds to 0/1/2
    rc = jx_main(["hybrid", "-bfile", prefix, "-p1", str(tmp_path / "p1.txt"),
                  "-p2", str(tmp_path / "p2.txt"), "-fmt", "plink",
                  "-o", str(tmp_path), "-prefix", "hbp"])
    assert rc == 0
    hb = plink.read_plink(str(tmp_path / "hbp"))
    assert set(np.unique(hb.genotypes)) <= {0, 1, 2}
    # view
    assert jx_main(["view", prefix]) == 0
    out = capsys.readouterr().out
    assert "format=bed" in out and "samples=60" in out
    # refcheck
    assert jx_main(["refcheck", "-bfile", prefix, "-p", prefix + ".pheno"]) == 0
    out = capsys.readouterr().out
    assert "matched=60" in out
    # gs + postgs (with OOF pred-vs-obs, violin, runtime scatter, effects)
    rc = jx_main(["gs", "-bfile", prefix, "-p", prefix + ".pheno", "-BLUP",
                  "-cv", "3", "-effect",
                  "-o", str(tmp_path), "-prefix", "g"])
    assert rc == 0
    oof = tmp_path / "g.trait0.oof.tsv"
    assert oof.exists()
    hdr = oof.read_text().splitlines()
    assert hdr[0].split("\t")[1] == "observed"
    assert len(hdr) >= 50  # all phenotyped samples appear
    effect_files = sorted(tmp_path.glob("g.trait0.*.effect.tsv"))
    argv = ["postgs", "-i", str(tmp_path / "g.gs.summary.json"),
            "-oof", str(oof), "-o", str(tmp_path), "-prefix", "pg"]
    if effect_files:
        argv += ["-effect", str(effect_files[0])]
    rc = jx_main(argv)
    assert rc == 0
    assert (tmp_path / "pg.gs.metrics.tsv").exists()
    assert (tmp_path / "pg.cv.violin.png").exists()
    assert (tmp_path / "pg.cv.runtime.png").exists()
    assert list(tmp_path.glob("pg.g.trait0.*.pred.png"))
    if effect_files:
        assert list(tmp_path.glob("pg.*.effects.png"))


def test_gff_index(tmp_path):
    from janusx_tpu.utils.gff import GffIndex

    gff = tmp_path / "a.gff3"
    gff.write_text(
        "##gff-version 3\n"
        "1\tsrc\tgene\t1000\t2000\t.\t+\t.\tID=g1;Name=GeneA\n"
        "1\tsrc\tgene\t5000\t9000\t.\t-\t.\tID=g2;Name=GeneB\n"
        "2\tsrc\tgene\t100\t300\t.\t+\t.\tID=g3\n"
        "1\tsrc\texon\t1000\t1100\t.\t+\t.\tID=e1\n"
    )
    idx = GffIndex.from_file(str(gff))
    assert [g.name for g in idx.query("1", 1500)] == ["GeneA"]
    assert idx.query("1", 3000) == []
    g, d = idx.nearest("1", 4000)
    assert g.name == "GeneB" and d == 1000
    g, d = idx.nearest("2", 200)
    assert g.name == "g3" and d == 0


def test_postbsa_cli(rng, tmp_path):
    import pandas as pd

    from janusx_tpu.cli.bsa import main as bsa_main
    from janusx_tpu.cli.postbsa import main as postbsa_main

    m = 600
    depth = 40
    p2 = np.full(m, 0.5)
    p2[250:350] = 0.95
    df = pd.DataFrame(
        {
            "chrom": ["1"] * (m // 2) + ["2"] * (m - m // 2),
            "pos": np.concatenate(
                [np.arange(1, m // 2 + 1), np.arange(1, m - m // 2 + 1)]
            ) * 10_000,
            "alt1": rng.binomial(depth, 0.5, m),
            "ref1": 0,
            "alt2": rng.binomial(depth, p2),
            "ref2": 0,
        }
    )
    df["ref1"] = depth - df["alt1"]
    df["ref2"] = depth - df["alt2"]
    dp = tmp_path / "depths.tsv"
    df.to_csv(dp, sep="\t", index=False)
    assert bsa_main(["-i", str(dp), "-o", str(tmp_path), "-p", "x",
                     "-win", "500000"]) == 0
    bsa_tsv = str(tmp_path / "x.bsa.tsv")
    assert postbsa_main(["-i", bsa_tsv, "-d", str(dp), "-o", str(tmp_path),
                         "-prefix", "x", "-win", "500000",
                         "-sims", "2000"]) == 0
    out = pd.read_csv(tmp_path / "x.postbsa.tsv", sep="\t")
    for col in ("delta_ci_hi", "delta_smoothed", "gprime_p", "gprime_q",
                "sig_delta", "sig_gprime"):
        assert col in out.columns
    assert (out["gprime_p"] >= 0).all() and (out["gprime_p"] <= 1).all()
    # the planted divergent region (chrom 1 second half) must light up
    c1 = out[out["chrom"] == 1]
    sig_pos = c1.loc[c1["sig_gprime"], "pos"]
    assert len(sig_pos) > 0
    assert sig_pos.between(2_300_000, 3_700_000).mean() > 0.8
    assert (tmp_path / "x.bsa.png").exists()


def test_refcheck_ris(tmp_path, capsys):
    """RIS bibliography validation mode (reference refcheck.py)."""
    ris = (
        "TY  - JOUR\nTI  - A study\nAU  - Smith, John\nAU  - Smith, John\n"
        "T2  - Journal of \\& Things\nER  - \n"
        "TY  - JOUR\nTI  - Clean paper\nAU  - Doe, Jane\nSP  - 12-20\n"
        "DO  - 10.1234/ok\nER  - \n"
        "TY  - JOUR\nTI  - A study\nAU  - others\nN1  - note\nSP  - 5\nER  - \n"
    )
    path = tmp_path / "refs.ris"
    path.write_text(ris)
    rc = jx_main(["refcheck", "-i", str(path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "duplicate/near-duplicate author" in out
    assert "duplicate title" in out
    assert "leftover note/encoding field" in out
    assert "issues in 2" in out


def test_treeplot_layouts_and_grm(tmp_path, rng):
    """treeplot: newick + layouts + rooting + GRM input."""
    from janusx_tpu.models.tree import neighbor_joining

    D = rng.random((8, 8))
    D = (D + D.T) / 2
    np.fill_diagonal(D, 0)
    labels = [f"t{i}" for i in range(8)]
    nwk = tmp_path / "t.nwk"
    nwk.write_text(neighbor_joining(D, labels) + "\n")
    for layout in ("c", "r", "w"):
        rc = jx_main(["treeplot", "-i", str(nwk), "-layout", layout,
                      "-showlabels", "-root", "t3",
                      "-o", str(tmp_path), "-prefix", f"tp{layout}"])
        assert rc == 0
        assert (tmp_path / f"tp{layout}.tree.png").exists()
    K = np.eye(10) + 0.1 * rng.random((10, 10))
    K = (K + K.T) / 2
    np.save(tmp_path / "k.npy", K)
    (tmp_path / "k.id").write_text("\n".join(f"s{i}" for i in range(10)))
    rc = jx_main(["treeplot", "-k", str(tmp_path / "k.npy"),
                  "-o", str(tmp_path), "-prefix", "tg"])
    assert rc == 0
    assert (tmp_path / "tg.tree.png").exists()


def test_treeplot_reroot_invariants(rng):
    """Re-rooting preserves the leaf set and total branch length."""
    from janusx_tpu.cli.treeplot import parse_newick, reroot
    from janusx_tpu.models.tree import neighbor_joining

    def leaves(nd, acc=None):
        acc = [] if acc is None else acc
        if not nd[0]:
            acc.append(nd[2])
        for c in nd[0]:
            leaves(c, acc)
        return acc

    def total_blen(nd):
        return nd[1] + sum(total_blen(c) for c in nd[0])

    n = 9
    D = rng.random((n, n))
    D = (D + D.T) / 2
    np.fill_diagonal(D, 0)
    labels = [f"t{i}" for i in range(n)]
    base = parse_newick(neighbor_joining(D, labels))
    want_leaves, want_len = sorted(leaves(base)), total_blen(base)
    for target in labels:
        t2 = reroot(parse_newick(neighbor_joining(D, labels)), target)
        assert sorted(leaves(t2)) == want_leaves
        assert total_blen(t2) == pytest.approx(want_len, abs=1e-9)


def test_weighted_ibs_matches_device_kernel(rng):
    """weighted_ibs_distance(w=1) == the device IBS kernel (missing-aware)."""
    from janusx_tpu.models.tree import ibs_distance, weighted_ibs_distance

    m, n = 150, 20
    g = rng.integers(0, 3, (m, n)).astype(np.int8)
    g[rng.random((m, n)) < 0.05] = -1
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object), pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object), allele1=np.array(["G"] * m, object),
    )
    pg = pack_genotypes(
        GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object)),
        QcParams(maf=0.0, geno=1.0))
    np.testing.assert_allclose(
        ibs_distance(pg), weighted_ibs_distance(pg.dosages(), np.ones(pg.m)),
        atol=1e-6)


def test_gff_index_exact_vs_bruteforce(rng):
    """Overlap + nearest queries must be exact under long genes nested among
    many short ones (the old fixed-width back-scan windows missed them)."""
    from janusx_tpu.utils.gff import Gene, GffIndex

    genes = []
    for k in range(400):
        s = int(rng.integers(1, 1_000_000))
        ln = int(rng.integers(50, 2_000))
        genes.append(Gene("1", s, s + ln, f"g{k}", "+"))
    # a few very long genes spanning hundreds of short ones
    for k in range(3):
        s = int(rng.integers(1, 300_000))
        genes.append(Gene("1", s, s + 600_000, f"long{k}", "-"))
    idx = GffIndex(genes)
    for pos in rng.integers(1, 1_100_000, size=60):
        pos = int(pos)
        for w in (0, 5_000):
            got = {g.name for g in idx.query("1", pos, w)}
            want = {g.name for g in genes
                    if g.start <= pos + w and g.end >= pos - w}
            assert got == want, (pos, w)
        g, d = idx.nearest("1", pos, max_dist=2_000_000)
        want_d = min(max(x.start - pos, pos - x.end, 0) for x in genes)
        assert d == want_d, (pos, d, want_d)


def test_upgma_matches_scipy_average_linkage(rng):
    """UPGMA topology + ultrametric heights vs scipy average linkage."""
    from scipy.cluster.hierarchy import average, cut_tree
    from scipy.spatial.distance import squareform

    from janusx_tpu.models.tree import _tree_splits, upgma

    X = rng.normal(size=(12, 6))
    D = np.sqrt(((X[:, None] - X[None, :]) ** 2).sum(-1))
    names = [f"s{i}" for i in range(12)]
    nwk = upgma(D, names)
    assert nwk.endswith(";")
    # every scipy merge level induces a partition; the UPGMA tree's
    # splits must be unions of scipy's average-linkage clusters
    Z = average(squareform(D, checks=False))
    scipy_clusters = set()
    for k in range(1, 12):
        cut = cut_tree(Z, n_clusters=k).ravel()
        for c in np.unique(cut):
            scipy_clusters.add(frozenset(np.array(names)[cut == c]))
    for split in _tree_splits(nwk):
        side = frozenset(split)
        other = frozenset(set(names) - set(split))
        assert side in scipy_clusters or other in scipy_clusters, split
    # ultrametric: all tips equidistant from the root
    from janusx_tpu.cli.treeplot import parse_newick

    t = parse_newick(nwk)

    def depths(nd, d, acc):
        blen = nd[1]
        if not nd[0]:
            acc.append(d + blen)
        for c in nd[0]:
            depths(c, d + blen, acc)
        return acc

    dep = depths(t, 0.0, [])
    assert np.allclose(dep, dep[0], atol=1e-9)


def test_treeplot_upgma_meta_fmt(tmp_path, rng):
    """treeplot reference flags: -method upgma, -meta coloring, -fmt."""
    K = np.eye(10) + 0.1 * rng.random((10, 10))
    K = (K + K.T) / 2
    np.save(tmp_path / "k.npy", K)
    (tmp_path / "k.id").write_text("\n".join(f"s{i}" for i in range(10)))
    meta = tmp_path / "meta.tsv"
    meta.write_text("sample\tgroup\n" + "\n".join(
        f"s{i}\t{'A' if i < 5 else 'B'}" for i in range(10)))
    rc = jx_main(["treeplot", "-k", str(tmp_path / "k.npy"),
                  "-method", "upgma", "-meta", str(meta), "-fmt", "pdf",
                  "-showlabels", "--scale-bar", "--edge-width", "1.5",
                  "-fontsize", "7", "-o", str(tmp_path), "-prefix", "up"])
    assert rc == 0
    assert (tmp_path / "up.tree.pdf").exists()
