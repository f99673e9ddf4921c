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
