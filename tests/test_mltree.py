"""Approximate-ML tree tests (reference tree.rs optimize_nni_ml_jc69)."""

import numpy as np
import pytest

from janusx_tpu.models.mltree import (
    genotype_leaf_partials,
    ml_refine_tree,
    ml_tree,
    parse_newick,
    to_newick,
)


def test_newick_parse_roundtrip():
    s = "((a:0.1,b:0.2):0.05,(c:0.3,d:0.1):0.02);"
    t = parse_newick(s)
    assert t.n_leaves == 4
    assert sorted(l for l in t.labels if l) == ["a", "b", "c", "d"]
    t2 = parse_newick(to_newick(t))
    assert sorted(l for l in t2.labels if l) == ["a", "b", "c", "d"]


def _clade_genotypes(seed=0, n_per=6, m=600, div=0.35):
    """Two diverged clades: shared ancestral freqs, clade-specific drift."""
    rng = np.random.default_rng(seed)
    p0 = rng.uniform(0.2, 0.8, size=m)
    pa = np.clip(p0 + rng.normal(0, div, m), 0.02, 0.98)
    pb = np.clip(p0 - rng.normal(0, div, m), 0.02, 0.98)
    cols, names = [], []
    for i in range(n_per):
        cols.append(rng.binomial(2, pa))
        names.append(f"A{i}")
    for i in range(n_per):
        cols.append(rng.binomial(2, pb))
        names.append(f"B{i}")
    return np.array(cols, np.int8).T, names  # (m, n)


def _clade_split(newick, names_a):
    """True if some internal edge separates exactly clade A."""
    t = parse_newick(newick)

    def leaves(v):
        if not t.children[v]:
            return {t.labels[v]}
        out = set()
        for c in t.children[v]:
            out |= leaves(c)
        return out

    all_l = leaves(t.root)
    target = set(names_a)
    for v in range(len(t.children)):
        if v == t.root:
            continue
        lv = leaves(v)
        if lv == target or (all_l - lv) == target:
            return True
    return False


def test_ml_refinement_improves_loglik_and_recovers_clades():
    codes, names = _clade_genotypes()
    parts = genotype_leaf_partials(codes)
    # deliberately scrambled caterpillar start topology
    order = [names[i] for i in [0, 6, 1, 7, 2, 8, 3, 9, 4, 10, 5, 11]]
    nwk = order[0]
    for nm in order[1:]:
        nwk = f"({nwk}:0.1,{nm}:0.1)"
    nwk += ";"
    t0 = ml_refine_tree(nwk, parts, names, k=2, nni_rounds=0)
    ll0 = t0.loglik
    t = ml_refine_tree(nwk, parts, names, k=2)
    assert np.isfinite(t.loglik)
    assert t.loglik > ll0 + 1.0, f"NNI did not improve: {ll0} -> {t.loglik}"
    assert _clade_split(to_newick(t), [f"A{i}" for i in range(6)])


def test_ml_tree_from_packed():
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.io.packed import QcParams, pack_genotypes

    codes, names = _clade_genotypes(seed=3)
    m, n = codes.shape
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["C"] * m, object),
    )
    pg = pack_genotypes(
        GenotypeData(codes, sites, np.array(names, object)),
        QcParams(maf=0.0, geno=1.0),
    )
    nwk, ll = ml_tree(pg, site_budget=500)
    assert np.isfinite(ll)
    assert nwk.endswith(";") and all(nm in nwk for nm in names)
    assert _clade_split(nwk, [f"A{i}" for i in range(6)])


def test_branch_length_closed_form_matches_grid():
    """Newton x* matches a dense grid search of the edge likelihood."""
    from janusx_tpu.models.mltree import _edge_ab, _optimize_x

    rng = np.random.default_rng(1)
    up = rng.random((400, 2)) + 0.05
    down = rng.random((400, 2)) + 0.05
    a, b = _edge_ab(up, down, 2)
    xs = np.linspace(1e-4, 1 - 1e-6, 4000)
    vals = [np.log(x * a + (1 - x) * b / 2).sum() for x in xs]
    x_grid = xs[int(np.argmax(vals))]
    x_newton = _optimize_x(a, b, 2, 0.5)
    assert x_newton == pytest.approx(x_grid, abs=2e-3)


def test_weighted_loglik_matches_materialized_resample():
    """Weighted site likelihood == likelihood of the materialized
    duplicated-site alignment (integer multiplicities) — the invariant
    that makes bootstrap-by-weights compose with -ml."""
    from janusx_tpu.models.mltree import (
        _down_pass, _loglik_from_down, optimize_branch_lengths,
    )

    codes, names = _clade_genotypes(seed=5, n_per=4, m=120)
    rng = np.random.default_rng(2)
    w = rng.multinomial(codes.shape[0],
                        np.full(codes.shape[0], 1.0 / codes.shape[0]))
    parts_w = genotype_leaf_partials(codes, site_budget=10**9)
    rows = np.repeat(np.arange(codes.shape[0]), w)
    parts_m = genotype_leaf_partials(codes[rows], site_budget=10**9)

    nwk = names[0]
    for nm in names[1:]:
        nwk = f"({nwk}:0.1,{nm}:0.1)"
    nwk += ";"
    t = parse_newick(nwk)
    leaf_part_w, leaf_part_m = {}, {}
    lookup_w = dict(zip(names, parts_w))
    lookup_m = dict(zip(names, parts_m))
    for v in range(len(t.children)):
        if not t.children[v]:
            leaf_part_w[v] = lookup_w[t.labels[v]]
            leaf_part_m[v] = lookup_m[t.labels[v]]
    down_w, scal_w = _down_pass(t, leaf_part_w, 2)
    down_m, scal_m = _down_pass(t, leaf_part_m, 2)
    ll_w = _loglik_from_down(t, down_w, scal_w, 2, w.astype(float))
    ll_m = _loglik_from_down(t, down_m, scal_m, 2, None)
    assert ll_w == pytest.approx(ll_m, rel=1e-12)

    # the weighted branch-length optimum equals the materialized one
    tw = ml_refine_tree(nwk, parts_w, names, k=2, nni_rounds=0,
                        weights=w.astype(float))
    tm = ml_refine_tree(nwk, parts_m, names, k=2, nni_rounds=0)
    assert tw.loglik == pytest.approx(tm.loglik, rel=1e-9)
    np.testing.assert_allclose(tw.blen, tm.blen, rtol=1e-6, atol=1e-9)


def test_ml_bootstrap_support_annotates():
    """-b composes with -ml: true clades get near-100% support."""
    from janusx_tpu.models.mltree import ml_bootstrap_support

    codes, names = _clade_genotypes(seed=7, n_per=4, m=300)
    parts = genotype_leaf_partials(codes, site_budget=10**9)
    from janusx_tpu.models.tree import neighbor_joining, weighted_ibs_distance

    D = weighted_ibs_distance(codes, np.ones(codes.shape[0]))
    base = neighbor_joining(D, names)
    t = ml_refine_tree(base, parts, names, k=2)
    ann = ml_bootstrap_support(to_newick(t), parts, names, k=2, n_boot=10,
                               seed=0, nni_rounds=4)
    import re

    supports = [float(x) for x in re.findall(r"\)(\d+(?:\.\d+)?):", ann)]
    assert supports, "no support annotations written"
    assert max(supports) >= 90.0


def test_tree_cli_ml_bootstrap(tmp_path):
    """`jx tree -ml -b` end-to-end (VERDICT r2 item 9 done-criterion)."""
    from janusx_tpu.cli.tree import main as tree_main
    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo

    codes, names = _clade_genotypes(seed=9, n_per=4, m=200)
    m = codes.shape[0]
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["C"] * m, object),
    )
    gd = GenotypeData(codes, sites, np.array(names, object))
    prefix = str(tmp_path / "t")
    plink.write_plink_genotypes(prefix, gd)
    rc = tree_main(["-bfile", prefix, "-ml", "-b", "5", "-maf", "0.0",
                    "-geno", "1.0", "-o", str(tmp_path / "out")])
    assert rc == 0
    ml = open(str(tmp_path / "out" / "jxtree.ml.nwk")).read()
    assert ml.strip().endswith(";")
    import re

    assert re.search(r"\)\d+(?:\.\d+)?:", ml), "ML tree lacks bootstrap support"


def test_shlike_support_high_on_true_clades():
    """SH-like/RELL supports: the planted clade split gets near-1 support
    and all values stay in [0, 1] (reference --support shlike)."""
    from janusx_tpu.models.mltree import (
        shlike_support, to_newick_with_support,
    )

    codes, names = _clade_genotypes(seed=11, n_per=4, m=400)
    parts = genotype_leaf_partials(codes, site_budget=10**9)
    from janusx_tpu.models.tree import neighbor_joining, weighted_ibs_distance

    D = weighted_ibs_distance(codes, np.ones(codes.shape[0]))
    t = ml_refine_tree(neighbor_joining(D, names), parts, names, k=2)
    sup = shlike_support(t, t.partials, k=2, n_res=200, seed=0,
                         rates=t.rates)
    assert sup, "no NNI-eligible internal edges scored"
    vals = list(sup.values())
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert max(vals) >= 0.95  # the clean clade split is decisive
    ann = to_newick_with_support(t, sup)
    import re

    labels = [int(x) for x in re.findall(r"\)(\d+):", ann)]
    assert labels and max(labels) >= 95
    t2 = parse_newick(ann)  # annotated newick stays parseable
    assert t2.n_leaves == 8
    # determinism: shared RELL draws -> same supports for same seed
    sup2 = shlike_support(t, t.partials, k=2, n_res=200, seed=0,
                          rates=t.rates)
    assert sup == sup2


def test_shlike_noise_sites_get_low_support():
    """Pure-noise data: no split is real, so SH-like supports must not
    all saturate (a frequent failure mode of misimplemented RELL)."""
    from janusx_tpu.models.mltree import shlike_support

    rng = np.random.default_rng(5)
    codes = rng.binomial(2, 0.5, size=(400, 8)).astype(np.int8)
    names = [f"s{i}" for i in range(8)]
    parts = genotype_leaf_partials(codes, site_budget=10**9)
    from janusx_tpu.models.tree import neighbor_joining, weighted_ibs_distance

    D = weighted_ibs_distance(codes, np.ones(codes.shape[0]))
    t = ml_refine_tree(neighbor_joining(D, names), parts, names, k=2)
    sup = shlike_support(t, t.partials, k=2, n_res=300, seed=1,
                         rates=t.rates)
    assert sup and min(sup.values()) <= 0.9


def test_tree_cli_shlike_and_profile(tmp_path):
    """`jx tree -ml -b --support shlike --profile` end-to-end."""
    from janusx_tpu.cli.tree import main as tree_main
    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo

    codes, names = _clade_genotypes(seed=13, n_per=4, m=200)
    m = codes.shape[0]
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["C"] * m, object),
    )
    gd = GenotypeData(codes, sites, np.array(names, object))
    prefix = str(tmp_path / "t")
    plink.write_plink_genotypes(prefix, gd)
    rc = tree_main(["-bfile", prefix, "-ml", "-b", "--support", "shlike",
                    "--profile", "-maf", "0.0", "-geno", "1.0",
                    "-o", str(tmp_path / "out")])
    assert rc == 0
    ml = open(str(tmp_path / "out" / "jxtree.ml.nwk")).read()
    import re

    assert re.search(r"\)\d+:", ml), "ML tree lacks SH-like supports"
    prof = open(str(tmp_path / "out" / "jxtree.profile.tsv")).read()
    assert prof.startswith("phase\tseconds\n")
    assert "ml-support-shlike" in prof and "ml-refine" in prof


def test_spr_recovers_distant_misplacement():
    """A leaf grafted far from its clade in the start topology needs a
    long-range move: SPR must recover the clade split (and beat the
    NNI-only search's likelihood or match it having found the split)."""
    codes, names = _clade_genotypes(seed=21, n_per=5, m=500)
    parts = genotype_leaf_partials(codes, site_budget=10**9)
    # start topology: A4 planted deep inside the B clade
    a_names = [f"A{i}" for i in range(5)]
    b_names = [f"B{i}" for i in range(5)]
    mis = "(((((A0:.1,A1:.1):.1,(A2:.1,A3:.1):.1):.1,(B0:.1,B1:.1):.1):.1," \
          "((B2:.1,(B3:.1,A4:.1):.1):.1,B4:.1):.1));"
    t_nni = ml_refine_tree(mis, parts, names, k=2, spr=False)
    t_spr = ml_refine_tree(mis, parts, names, k=2, spr=True)
    assert t_spr.loglik >= t_nni.loglik - 1e-6
    assert _clade_split(to_newick(t_spr), a_names), \
        f"SPR failed to recover the clade: {to_newick(t_spr)}"


def test_rate_categories_improve_heterogeneous_fit():
    """Half the sites evolve 8x faster: CAT per-site rates must raise the
    refit likelihood over the uniform-rate model on the same topology."""
    rng = np.random.default_rng(31)
    m_slow, m_fast = 300, 300
    codes, names = _clade_genotypes(seed=31, n_per=5, m=m_slow)
    # fast sites: near-independent noise (high effective rate)
    fast = rng.integers(0, 3, size=(m_fast, len(names))).astype(np.int8)
    allc = np.vstack([codes, fast])
    parts = genotype_leaf_partials(allc, site_budget=10**9)
    from janusx_tpu.models.tree import neighbor_joining, weighted_ibs_distance

    D = weighted_ibs_distance(allc, np.ones(allc.shape[0]))
    base = neighbor_joining(D, names)
    t_uni = ml_refine_tree(base, parts, names, k=2, rate_categories=1)
    t_cat = ml_refine_tree(base, parts, names, k=2, rate_categories=8)
    # CAT loglik is under a different (per-site-rate) model — compare the
    # data fit: it must improve by a clear margin on heterogeneous sites
    assert t_cat.loglik > t_uni.loglik + 10.0, (t_cat.loglik, t_uni.loglik)
    from janusx_tpu.models.mltree import estimate_site_rates, parse_newick

    # rates must actually separate the two site classes
    tt = parse_newick(to_newick(t_cat))
    lookup = dict(zip(names, parts))
    lp = {v: lookup[tt.labels[v]] for v in range(len(tt.children))
          if not tt.children[v]}
    r = estimate_site_rates(tt, lp, 2, ncat=8)
    assert np.median(r[m_slow:]) > np.median(r[:m_slow])


def test_weighted_likelihood_matches_materialized_under_rates():
    """The bootstrap-weights identity must hold under CAT rates too."""
    from janusx_tpu.models.mltree import _down_pass, _loglik_from_down

    codes, names = _clade_genotypes(seed=41, n_per=4, m=100)
    parts = genotype_leaf_partials(codes, site_budget=10**9)
    rng = np.random.default_rng(3)
    m = codes.shape[0]
    w = rng.multinomial(m, np.full(m, 1.0 / m))
    rates = np.geomspace(0.5, 2.0, m)
    rows = np.repeat(np.arange(m), w)
    parts_m = genotype_leaf_partials(codes[rows], site_budget=10**9)

    nwk = names[0]
    for nm in names[1:]:
        nwk = f"({nwk}:0.1,{nm}:0.1)"
    nwk += ";"
    t = parse_newick(nwk)
    lookup_w = dict(zip(names, parts))
    lookup_m = dict(zip(names, parts_m))
    lp_w, lp_m = {}, {}
    for v in range(len(t.children)):
        if not t.children[v]:
            lp_w[v] = lookup_w[t.labels[v]]
            lp_m[v] = lookup_m[t.labels[v]]
    dw, sw = _down_pass(t, lp_w, 2, rates)
    dm, sm = _down_pass(t, lp_m, 2, rates[rows])
    ll_w = _loglik_from_down(t, dw, sw, 2, w.astype(float))
    ll_m = _loglik_from_down(t, dm, sm, 2, None)
    assert ll_w == pytest.approx(ll_m, rel=1e-12)


def test_bionj_recovers_clades_and_matches_nj_on_clean_data():
    """BIONJ (variance-weighted NJ) recovers the planted clade split on
    genotype data under every variance mode."""
    from janusx_tpu.models.tree import bionj, bionj_stats

    codes, names = _clade_genotypes(seed=13, n_per=5, m=400)
    for mode in ("jc", "binom", "dist", "auto"):
        D, V = bionj_stats(codes, 3, var_mode=mode)
        assert (V >= 0).all() and np.isfinite(D).all()
        nwk = bionj(D, V, names)
        assert nwk.endswith(";")
        assert _clade_split(nwk, [f"A{i}" for i in range(5)]), mode


def test_rapid_nj_matches_exact_nj():
    """RapidNJ pruned search picks the same min-Q joins as classic NJ:
    identical split sets on generic (tie-free) random distances."""
    from janusx_tpu.models.tree import (
        _tree_splits, neighbor_joining, rapid_neighbor_joining,
    )

    for seed in range(6):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 40))
        X = rng.normal(size=(n, 12))
        D = np.sqrt(((X[:, None] - X[None, :]) ** 2).sum(-1))
        names = [f"s{i}" for i in range(n)]
        exact = neighbor_joining(D, names)
        rapid = rapid_neighbor_joining(D, names)
        assert _tree_splits(rapid) == _tree_splits(exact), f"seed {seed}"


def test_rapid_nj_branch_lengths_and_clades():
    """Branch lengths follow the classic NJ formulas and the planted
    clade split is recovered on genotype distances."""
    from janusx_tpu.models.tree import (
        rapid_neighbor_joining, weighted_ibs_distance,
    )

    codes, names = _clade_genotypes(seed=17, n_per=6, m=500)
    D = weighted_ibs_distance(codes, np.ones(codes.shape[0]))
    nwk = rapid_neighbor_joining(D, names)
    assert nwk.endswith(";")
    assert _clade_split(nwk, [f"A{i}" for i in range(6)])
    t = parse_newick(nwk)
    assert t.n_leaves == 12
    # no negative branch lengths (clamped exactly like the classic path)
    assert (t.blen[np.arange(len(t.blen)) != t.root] >= 0).all()


def test_rapid_nj_midsize():
    """n=500 completes quickly and yields a valid binary tree (the
    classic path at this size already spends seconds in matrix pads)."""
    from janusx_tpu.models.tree import rapid_neighbor_joining

    rng = np.random.default_rng(99)
    X = rng.normal(size=(500, 8))
    D = np.sqrt(((X[:, None] - X[None, :]) ** 2).sum(-1))
    names = [f"s{i}" for i in range(500)]
    import time

    t0 = time.monotonic()
    nwk = rapid_neighbor_joining(D, names)
    assert time.monotonic() - t0 < 30.0
    assert nwk.count("(") == 499 and nwk.endswith(";")


def test_tree_cli_bionj_and_asc(tmp_path):
    """`jx tree -nj bionj` and `-ml -asc` run end-to-end; -asc shrinks
    branch lengths (pseudo-constant sites penalize long branches)."""
    from janusx_tpu.cli.tree import main as tree_main
    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo

    codes, names = _clade_genotypes(seed=17, n_per=4, m=250)
    m = codes.shape[0]
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["C"] * m, object),
    )
    gd = GenotypeData(codes, sites, np.array(names, object))
    prefix = str(tmp_path / "t")
    plink.write_plink_genotypes(prefix, gd)
    rc = tree_main(["-bfile", prefix, "-nj", "bionj", "-maf", "0.0",
                    "-geno", "1.0", "-o", str(tmp_path / "bj")])
    assert rc == 0
    nwk = open(str(tmp_path / "bj" / "jxtree.nwk")).read()
    assert _clade_split(nwk, [f"A{i}" for i in range(4)])

    def total_blen(path):
        t = parse_newick(open(path).read())
        return float(t.blen.sum())

    rc = tree_main(["-bfile", prefix, "-ml", "-maf", "0.0", "-geno", "1.0",
                    "-o", str(tmp_path / "plain")])
    assert rc == 0
    import os

    os.environ["JANUSX_ASC_PSEUDO_CONST"] = "40"
    try:
        rc = tree_main(["-bfile", prefix, "-ml", "-asc", "-maf", "0.0",
                        "-geno", "1.0", "-o", str(tmp_path / "asc")])
    finally:
        del os.environ["JANUSX_ASC_PSEUDO_CONST"]
    assert rc == 0
    b_plain = total_blen(str(tmp_path / "plain" / "jxtree.ml.nwk"))
    b_asc = total_blen(str(tmp_path / "asc" / "jxtree.ml.nwk"))
    assert b_asc < b_plain, (b_asc, b_plain)


# -- ME starting tree + Gamma20 rescaling (VERDICT r4 item 10) --------------


def test_me_nni_start_repairs_perturbed_topology():
    """Minimum-evolution NNIs on the distance matrix restore the clade
    split after a deliberate cross-clade leaf misplacement (FastTree
    starts -ml from an ME tree; me_nni_start is that stage)."""
    from janusx_tpu.models.mltree import me_nni_start
    from janusx_tpu.models.tree import weighted_jc_distance

    codes, names = _clade_genotypes(seed=4)
    D = weighted_jc_distance(codes, np.ones(codes.shape[0]))
    # scrambled caterpillar interleaving the two clades
    order = [names[i] for i in [0, 6, 1, 7, 2, 8, 3, 9, 4, 10, 5, 11]]
    nwk = order[0] + ":0.1"
    for nm in order[1:]:
        nwk = f"({nwk},{nm}:0.1):0.1"
    nwk += ";"
    assert not _clade_split(nwk, names[:6])
    fixed = me_nni_start(nwk, D, names)
    assert _clade_split(fixed, names[:6])


def test_me_nni_start_preserves_good_topology():
    """A topology that already separates the clades stays separated (ME
    NNIs must not damage an NJ tree on clean data)."""
    from janusx_tpu.models.mltree import me_nni_start
    from janusx_tpu.models.tree import neighbor_joining, weighted_jc_distance

    codes, names = _clade_genotypes(seed=9)
    D = weighted_jc_distance(codes, np.ones(codes.shape[0]))
    nwk = neighbor_joining(D, names)
    assert _clade_split(nwk, names[:6])
    fixed = me_nni_start(nwk, D, names)
    assert _clade_split(fixed, names[:6])
    assert sorted(
        l for l in parse_newick(fixed).labels if l) == sorted(names)


def _fit_small_tree(seed=0):
    codes, names = _clade_genotypes(seed=seed, n_per=5, m=500)
    parts = genotype_leaf_partials(codes)
    from janusx_tpu.models.tree import neighbor_joining, weighted_jc_distance

    D = weighted_jc_distance(codes, np.ones(codes.shape[0]))
    nwk = neighbor_joining(D, names)
    t = ml_refine_tree(nwk, parts, names, k=2, spr=False)
    return t, parts


def test_gamma20_rescale_improves_gamma_likelihood():
    """On a deep/heterogeneous synthetic tree the optimized (alpha,
    scale) Gamma20 likelihood beats the unrescaled uniform-ish one, and
    the branch lengths are rescaled by the returned factor."""
    from janusx_tpu.models.mltree import gamma20_rescale

    t, parts = _fit_small_tree(seed=2)
    blen0 = t.blen.copy()
    gll, alpha, scale = gamma20_rescale(t, t.partials, k=2)
    assert np.isfinite(gll) and gll < 0
    assert 0.1 < alpha < 25 and 0.25 < scale < 3.5
    np.testing.assert_allclose(
        t.blen, np.clip(blen0 * scale, 1e-7, 5.0), rtol=1e-12)


def test_gamma20_scale_corrects_planted_misscaling():
    """Shrinking every branch length by 1/f must push the ML rescale up
    by ~f relative to the unperturbed tree — the scale optimization
    actually measures tree length."""
    import copy

    from janusx_tpu.models.mltree import gamma20_rescale

    t, _ = _fit_small_tree(seed=3)
    t_ref = copy.deepcopy(t)
    _, _, scale_ref = gamma20_rescale(t_ref, t_ref.partials, k=2)
    f = 1.6
    t.blen = np.clip(t.blen / f, 1e-7, 5.0)
    _, _, scale_shrunk = gamma20_rescale(t, t.partials, k=2)
    assert scale_shrunk / scale_ref == pytest.approx(f, rel=0.12)


def test_tree_cli_ml_gamma_and_me_flags(tmp_path):
    """`jx tree -ml -ml-gamma` writes the rescaled tree and reports
    Gamma20LogLk; -ml-no-me opts out of the ME start without error."""
    import io
    from contextlib import redirect_stdout

    from janusx_tpu.cli.tree import main as tree_main
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.io.packed import QcParams, pack_genotypes
    from janusx_tpu.io.plink import write_plink

    codes, names = _clade_genotypes(seed=6, n_per=4, m=300)
    m, n = codes.shape
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )
    gd = GenotypeData(codes, sites, np.array(names, object))
    pg = pack_genotypes(gd, QcParams(maf=0.0, geno=1.0))
    geno = str(tmp_path / "pan")
    write_plink(geno, pg.packed, pg.n_samples, pg.sites, pg.samples)
    out = io.StringIO()
    with redirect_stdout(out):
        rc = tree_main(["-bfile", geno, "-ml", "-ml-gamma",
                        "-o", str(tmp_path), "-prefix", "tg"])
    assert rc in (0, None)
    assert "Gamma20LogLk=" in out.getvalue()
    assert (tmp_path / "tg.ml.nwk").exists()
    with redirect_stdout(io.StringIO()):
        rc = tree_main(["-bfile", geno, "-ml", "-ml-no-me",
                        "-o", str(tmp_path), "-prefix", "tn"])
    assert rc in (0, None)


def test_gamma20_category_means_property():
    """Yang-1994 discrete-Gamma category means: positive, increasing,
    averaging to 1 for any shape alpha (the identifiability constraint
    the rescaling relies on)."""
    from scipy.special import gammainc
    from scipy.stats import gamma as sgamma

    for alpha in (0.2, 0.7, 1.0, 3.0, 12.0):
        K = 20
        b = sgamma.ppf(np.arange(1, K) / K, alpha, scale=1.0 / alpha)
        Pb = np.concatenate([[0.0], gammainc(alpha + 1.0, alpha * b), [1.0]])
        means = K * np.diff(Pb)
        assert (means > 0).all()
        assert (np.diff(means) > -1e-12).all()
        assert abs(means.mean() - 1.0) < 1e-9, alpha
