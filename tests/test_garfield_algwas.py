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
