"""GARFIELD logic search and ALGWAS tests."""

import numpy as np
import pytest

from janusx_tpu.io.gdata import GenotypeData, SiteInfo
from janusx_tpu.io.packed import QcParams, pack_genotypes


@pytest.fixture(scope="module")
def epi_problem():
    rng = np.random.default_rng(31)
    m, n = 300, 400
    p = rng.uniform(0.25, 0.6, size=m)
    p[10] = p[40] = 0.45  # hom-alt ~20% each -> AND support ~4% of samples
    g = rng.binomial(2, p[:, None], size=(m, n)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object), pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object), allele1=np.array(["G"] * m, object),
    )
    gd = GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object))
    pg = pack_genotypes(gd, QcParams(maf=0.05, geno=0.1))
    d = pg.dosages()
    # pure epistatic signal: hom-alt AND hom-alt of two markers
    rule = ((d[10] == 2) & (d[40] == 2)).astype(float)
    y = 2.0 * rule + rng.normal(size=pg.n) * 0.8
    return pg, y, rule


def test_garfield_finds_interaction(epi_problem):
    from janusx_tpu.models.garfield import garfield_scan

    pg, y, rule = epi_problem
    res = garfield_scan(pg, y, depth=2, beam=48, n_perm=30, seed=2)
    # the top depth-2 rule should be the planted AND pair
    found = False
    for ru in res.rules[:5]:
        if len(ru.snps) == 2 and set(ru.snps) == {10, 40} and "AND" in ru.ops:
            found = True
            break
    assert found, [(ru.snps, ru.ops, round(ru.score, 3)) for ru in res.rules[:5]]
    assert res.pvalues[0] <= 0.05
    assert len(res.perm_max_scores) == 30


def test_garfield_null_no_signal(epi_problem):
    from janusx_tpu.models.garfield import garfield_scan

    pg, y, rule = epi_problem
    rng = np.random.default_rng(0)
    ynull = rng.normal(size=pg.n)
    res = garfield_scan(pg, ynull, depth=2, beam=32, n_perm=40, seed=3)
    # best rule should NOT be significant under permutation
    assert res.pvalues[0] > 0.05


def test_algwas_selects_causal(epi_problem):
    from janusx_tpu.models.algwas import algwas_scan

    pg, _, _ = epi_problem
    rng = np.random.default_rng(5)
    Z = pg.centered()
    causal = [7, 77, 150]
    y = Z[causal].T @ np.array([0.9, -0.8, 0.7]) + rng.normal(size=pg.n) * 0.8
    out = algwas_scan(pg, y)
    assert len(out.selected) >= 2
    # selected set should hit at least 2 of the 3 planted markers
    hits = sum(1 for c in causal if np.any(np.abs(out.selected - c) <= 1))
    assert hits >= 2, out.selected
    # stage-2 scan ranks causal markers at top
    top = set(np.argsort(out.result.pwald)[:8].tolist())
    assert sum(1 for c in causal if c in top) >= 2


def test_garfield_binary_mcc_finds_interaction(epi_problem):
    """Binary-trait rule search (MCC scoring, reference
    beam_search_and_binary_mcc) on a planted epistatic pair."""
    from janusx_tpu.models.garfield import garfield_scan

    pg, y, rule = epi_problem
    rng = np.random.default_rng(11)
    # binary trait: rule carriers are cases with high penetrance + noise
    yb = ((rule > 0) | (rng.random(pg.n) < 0.05)).astype(float)
    res = garfield_scan(pg, yb, depth=2, beam=48, n_perm=30, seed=4)
    assert res.mode == "mcc"
    found = any(
        len(ru.snps) == 2 and set(ru.snps) == {10, 40} and "AND" in ru.ops
        for ru in res.rules[:5]
    )
    assert found, [(ru.snps, ru.ops, round(ru.score, 3)) for ru in res.rules[:5]]
    assert res.pvalues[0] <= 0.05


def test_garfield_and_not_rule(epi_problem):
    """Planted AND-NOT signal: carriers of marker A that are NOT hom-alt
    at marker B."""
    from janusx_tpu.models.garfield import garfield_scan

    pg, _, _ = epi_problem
    rng = np.random.default_rng(12)
    d = pg.dosages()
    rule = ((d[20] == 2) & ~(d[60] == 2)).astype(float)
    y = 2.2 * rule + rng.normal(size=pg.n) * 0.7
    res = garfield_scan(pg, y, depth=2, beam=48, n_perm=20, seed=5)
    found = any(
        set(ru.snps) == {20, 60} and "ANDN" in ru.ops for ru in res.rules[:5]
    )
    assert found, [(ru.snps, ru.ops, round(ru.score, 3)) for ru in res.rules[:5]]
    # description renders the negation
    top = [ru for ru in res.rules if set(ru.snps) == {20, 60}][0]
    assert "AND NOT" in top.describe(pg.sites.snp)


def test_garfield_window_scan(epi_problem):
    from janusx_tpu.models.garfield import garfield_window_scan

    pg, y, rule = epi_problem
    # windows of 100 bp over pos 1..300 -> 3 windows; pair (10, 40) is
    # inside the first window
    out = garfield_window_scan(
        pg, y, window_kb=0.1, depth=2, beam=32, n_perm=10, seed=6
    )
    assert len(out) >= 3
    chrom, start, end, res0 = out[0]
    assert chrom == "1"
    for _, s, e, r in out:
        for ru in r.rules:
            assert all(s <= pg.sites.pos[i] < e for i in ru.snps)
    top_sets = [set(r.rules[0].snps) for _, s, e, r in out if r.rules]
    assert {10, 40} in top_sets


def test_garfield_preselect(epi_problem):
    from janusx_tpu.models.garfield import garfield_scan

    pg, y, rule = epi_problem
    res = garfield_scan(pg, y, depth=2, beam=48, n_perm=10, seed=7,
                        preselect=80)
    found = any(set(ru.snps) == {10, 40} for ru in res.rules[:5])
    assert found


def test_logistic_fit_matches_statsmodels_style():
    from janusx_tpu.models.logreg import logistic_fit

    rng = np.random.default_rng(3)
    n = 500
    x = rng.normal(size=(n, 2))
    eta = 0.5 + 1.2 * x[:, 0] - 0.7 * x[:, 1]
    y = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(float)
    X = np.concatenate([np.ones((n, 1)), x], axis=1)
    beta, se, ll, conv = logistic_fit(X, y)
    assert conv
    assert beta[1] == pytest.approx(1.2, abs=0.35)
    assert beta[2] == pytest.approx(-0.7, abs=0.3)
    # compare against scipy optimize of the same loglik
    import scipy.optimize

    def nll(b):
        e = np.clip(X @ b, -30, 30)
        return -(y @ e - np.log1p(np.exp(e)).sum())

    ref = scipy.optimize.minimize(nll, np.zeros(3), method="BFGS").x
    np.testing.assert_allclose(beta, ref, atol=1e-4)


def test_fit_best_and_not_binary():
    from janusx_tpu.models.logreg import fit_best_and_not

    rng = np.random.default_rng(8)
    m, n = 30, 600
    X = (rng.random((m, n)) < 0.4).astype(np.uint8)
    truth = (X[4] & (1 - X[9])).astype(bool)
    y = (truth | (rng.random(n) < 0.03)).astype(float)
    fit = fit_best_and_not(X, y, response="binary", score="loglik")
    lits = set(fit.literals)
    assert (4, False) in lits and (9, True) in lits, fit.literals
    assert "x4" in fit.expression and "!x9" in fit.expression


def test_fit_best_and_not_continuous():
    from janusx_tpu.models.logreg import fit_best_and_not

    rng = np.random.default_rng(9)
    m, n = 20, 500
    X = (rng.random((m, n)) < 0.5).astype(np.uint8)
    y = 3.0 * (X[2] & X[11]) + rng.normal(size=n) * 0.3
    fit = fit_best_and_not(X, y, response="continuous", score="mse")
    assert {(2, False), (11, False)} <= set(fit.literals)


def test_active_set_polish_kkt():
    from janusx_tpu.models.algwas import active_set_polish

    rng = np.random.default_rng(9)
    q, n = 12, 150
    Zs = rng.normal(size=(q, n))
    b_true = np.zeros(q)
    b_true[:3] = [2.0, -1.5, 1.0]
    r = Zs.T @ b_true + rng.normal(size=n) * 0.3
    lam = 8.0
    b = active_set_polish(Zs, r, lam, np.zeros(q))
    resid = r - Zs.T @ b
    grad = Zs @ resid
    on = np.abs(b) > 1e-10
    # KKT: active coords have gradient exactly lam*sign(b); zeros within lam
    np.testing.assert_allclose(grad[on], lam * np.sign(b[on]), atol=1e-6)
    assert (np.abs(grad[~on]) <= lam + 1e-6).all()
    # planted signals survive, most nulls are exactly zero
    assert on[:3].all()


def test_garfield_cli_reference_surface(tmp_path):
    """Reference garfield CLI spellings: -layer/-width/-topk/-lmaf,
    -w EXT STEP windows, -g gene-set scans with -gff, -engine RF,
    accepted dev flags, -bimrange."""
    import numpy as np

    from janusx_tpu.cli.main import main as jx_main
    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.models.sim import write_pheno

    rng = np.random.default_rng(5)
    m, n = 120, 150
    g = rng.binomial(2, 0.4, size=(m, n)).astype(np.int8)
    # plant an AND interaction between snp10 and snp40
    b = (g[10] == 2) & (g[40] == 2)
    y = rng.normal(size=n) * 0.5 + 2.0 * b
    sites = SiteInfo(
        chrom=np.array(["Chr1"] * m, object),
        pos=(np.arange(m, dtype=np.int64) + 1) * 100,
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )
    prefix = str(tmp_path / "gf")
    plink.write_plink_genotypes(
        prefix, GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object)))
    write_pheno(prefix + ".pheno", [f"i{j}" for j in range(n)], y[:, None])
    gff = tmp_path / "g.gff3"
    gff.write_text(
        "##gff-version 3\n"
        "Chr1\tsrc\tgene\t900\t4500\t.\t+\t.\tID=GeneA\n"
        "Chr1\tsrc\tgene\t3500\t6000\t.\t+\t.\tID=GeneB\n")
    genes = tmp_path / "genes.txt"
    genes.write_text("GeneA\tset1\nGeneB\tset1\n")

    # whole-genome with reference spellings + dev flags
    rc = jx_main([
        "garfield", "-bfile", prefix, "-p", prefix + ".pheno",
        "-layer", "2", "-width", "48", "-topk", "5", "-lmaf", "0.03",
        "-perm", "20", "-wg", "--xor-search", "-maf", "0.0", "-geno", "1.0",
        "-o", str(tmp_path), "-prefix", "wg",
    ])
    assert rc == 0
    out = open(str(tmp_path / "wg.trait0.garfield.tsv")).read()
    assert "s10" in out and "s40" in out  # planted pair found

    # gene-set scan: one unit covering both genes, planted pair inside;
    # TWO traits — regression: -g used to return after the first trait
    write_pheno(prefix + ".pheno2", [f"i{j}" for j in range(n)],
                np.stack([y, rng.normal(size=n)], axis=1))
    rc = jx_main([
        "garfield", "-bfile", prefix, "-p", prefix + ".pheno2",
        "-n", "0,1", "-g", str(genes), "-gff", str(gff), "-w", "0.5",
        "-perm", "20", "-maf", "0.0", "-geno", "1.0",
        "-o", str(tmp_path), "-prefix", "gs",
    ])
    assert rc == 0
    gout = open(str(tmp_path / "gs.trait0.garfield.genes.tsv")).read()
    assert "set1" in gout and "GeneA,GeneB" in gout
    assert (tmp_path / "gs.trait1.garfield.genes.tsv").exists(), \
        "gene mode must scan every selected trait, not just the first"

    # -w window scan with step + -bimrange restriction
    rc = jx_main([
        "garfield", "-bfile", prefix, "-p", prefix + ".pheno",
        "-w", "3", "1.5", "-perm", "10", "-bimrange", "Chr1:0-0.008",
        "-maf", "0.0", "-geno", "1.0", "-o", str(tmp_path), "-prefix", "wn",
    ])
    assert rc == 0
    assert (tmp_path / "wn.trait0.garfield.windows.tsv").exists()

    # RF engine preselect
    rc = jx_main([
        "garfield", "-bfile", prefix, "-p", prefix + ".pheno",
        "-engine", "RF", "-preselect", "30", "-perm", "10",
        "-maf", "0.0", "-geno", "1.0", "-o", str(tmp_path), "-prefix", "rf",
    ])
    assert rc == 0
    assert (tmp_path / "rf.trait0.garfield.tsv").exists()


def test_pm_spec_parsing():
    from janusx_tpu.models.garfield import parse_pm_spec

    assert parse_pm_spec(None) == ("gev", 0.99)
    assert parse_pm_spec("gev") == ("gev", 0.99)
    assert parse_pm_spec("gumbel") == ("gev", 0.99)
    assert parse_pm_spec("g99") == ("gev", 0.99)
    m_, q_ = parse_pm_spec("g99.9")
    assert m_ == "gev" and abs(q_ - 0.999) < 1e-12
    assert parse_pm_spec("q99") == ("quantile", 0.99)
    assert parse_pm_spec("0.95") == ("quantile", 0.95)
    for bad in ("", "gxx", "q0", "1.5", "zzz"):
        with pytest.raises(ValueError):
            parse_pm_spec(bad)


def test_rule_null_threshold_gev_and_quantile():
    from janusx_tpu.models.garfield import rule_null_threshold

    rng = np.random.default_rng(0)
    s = rng.gumbel(loc=0.2, scale=0.05, size=4000)
    # empirical quantile: nearest-rank
    q99 = rule_null_threshold(s, "quantile", 0.99)
    assert abs(q99 - np.sort(s)[int(np.ceil(0.99 * s.size)) - 1]) < 1e-12
    # Gumbel MoM fit recovers the true 99% quantile of the null
    g99 = rule_null_threshold(s, "gev", 0.99)
    true_q99 = 0.2 - 0.05 * np.log(-np.log(0.99))
    assert abs(g99 - true_q99) < 0.02
    # reference formula verbatim: scale=std*sqrt(6)/pi, loc=mean-gamma*scale
    scale = s.std(ddof=1) * np.sqrt(6) / np.pi
    loc = s.mean() - 0.5772156649015329 * scale
    assert abs(g99 - (loc - scale * np.log(-np.log(0.99)))) < 1e-12
    # the GEV threshold extrapolates beyond the empirical support at
    # extreme quantiles (the reason the reference fits it)
    g9999 = rule_null_threshold(s[:200], "gev", 0.9999)
    assert g9999 > np.max(s[:200]) * 0.9


def test_meff_bh_fdr():
    from janusx_tpu.models.garfield import bh_fdr

    p = np.array([0.001, 0.01, 0.04, 0.5])
    adj = bh_fdr(p)  # m = 4
    expect = [0.004, 0.02, 0.0533333, 0.5]
    assert np.allclose(adj, expect, atol=1e-4)
    # meff scales the test count (reference -m/--meff)
    adj100 = bh_fdr(p, n_tests=100)
    assert np.allclose(adj100, np.minimum([0.1, 0.5, 1.0, 1.0], 1.0), atol=1e-6)
    assert (adj100 >= adj - 1e-12).all()


def test_garfield_pm_changes_significant_set(epi_problem, tmp_path):
    """-pm g99 vs -pm q50 must change which rules are flagged significant
    (VERDICT r3 'done' criterion), and -m adds the pfdr column."""
    from janusx_tpu.models.garfield import (
        garfield_scan,
        rule_null_threshold,
        write_garfield_tsv,
    )

    pg, y, rule = epi_problem
    res = garfield_scan(pg, y, depth=2, beam=48, n_perm=40, seed=2,
                        top_rules=50)
    thr_strict = rule_null_threshold(res.perm_max_scores, "gev", 0.99)
    thr_loose = rule_null_threshold(res.perm_max_scores, "quantile", 0.50)
    sig_strict = [ru.score >= thr_strict for ru in res.rules]
    sig_loose = [ru.score >= thr_loose for ru in res.rules]
    assert thr_strict > thr_loose
    assert sum(sig_loose) > sum(sig_strict)  # the set actually changes
    assert sig_strict[0]  # the planted rule survives the strict threshold
    p1 = str(tmp_path / "pm.tsv")
    write_garfield_tsv(p1, res, pg.sites, score_threshold=thr_strict,
                       meff=5000)
    header = open(p1).readline().split()
    assert header == ["rule", "depth", "support", "score", "pperm", "sig",
                      "pfdr"]
    rows = [ln.split("\t") for ln in open(p1).read().splitlines()[1:]]
    assert [r[5] for r in rows] == [str(int(s)) for s in sig_strict]


def test_garfield_cli_pm_meff_end_to_end(tmp_path):
    from janusx_tpu.cli.main import main as jx_main
    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.models.sim import write_pheno

    rng = np.random.default_rng(7)
    m, n = 100, 200
    g = rng.binomial(2, 0.4, size=(m, n)).astype(np.int8)
    b = (g[10] == 2) & (g[40] == 2)
    y = rng.normal(size=n) * 0.5 + 2.0 * b
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=(np.arange(m, dtype=np.int64) + 1) * 100,
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )
    prefix = str(tmp_path / "pm")
    plink.write_plink_genotypes(
        prefix,
        GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object)))
    write_pheno(prefix + ".pheno", [f"i{j}" for j in range(n)], y[:, None])
    rc = jx_main(["garfield", "-bfile", prefix, "-p", prefix + ".pheno",
                  "-perm", "25", "-pm", "g99", "-m", "5000",
                  "-maf", "0.0", "-geno", "1.0",
                  "-o", str(tmp_path), "-prefix", "out"])
    assert rc == 0
    lines = open(str(tmp_path / "out.trait0.garfield.tsv")).read().splitlines()
    assert lines[0].split("\t") == ["rule", "depth", "support", "score",
                                    "pperm", "sig", "pfdr"]
    assert any(ln.split("\t")[5] == "1" for ln in lines[1:])
