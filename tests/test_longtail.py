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
                         "-p", "x", "-win", "500000", "-sims", "2000"]) == 0
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
