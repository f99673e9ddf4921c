"""Haseman-Elston tests: dense vs streamed (Hutchinson) agreement.

Reference: src/stats/he.rs he_pcg_bed — HE variance components with
streamed GRM.v products, the fast VC pre-fit for GS at large n.
"""

import numpy as np
import pytest

from janusx_tpu.io.gdata import GenotypeData, SiteInfo
from janusx_tpu.io.packed import QcParams, pack_genotypes
from janusx_tpu.models.grm import grm_from_packed
from janusx_tpu.models.he import he_regression, he_streamed, reml_h2


def _make_problem(seed=3, m=2000, n=400, h2=0.5):
    rng = np.random.default_rng(seed)
    p = rng.uniform(0.1, 0.5, size=m)
    g = rng.binomial(2, p[:, None], size=(m, n)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["C"] * m, object),
    )
    gd = GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object))
    pg = pack_genotypes(gd, QcParams(maf=0.01, geno=0.05))
    Z = pg.centered()
    eff = rng.normal(size=pg.m)
    gv = Z.T @ eff
    gv = gv / gv.std() * np.sqrt(h2)
    y = gv + rng.normal(size=n) * np.sqrt(1 - h2)
    return pg, y


@pytest.fixture(scope="module")
def he_problem():
    return _make_problem()


def test_dense_he_close_to_reml(he_problem):
    pg, y = he_problem
    K = grm_from_packed(pg)
    he = he_regression(K, y)
    rm = reml_h2(K, y)
    assert 0.2 < he.h2 < 0.8
    assert abs(he.h2 - rm.h2) < 0.2  # HE is a moment estimator


def test_streamed_matches_dense_traces(he_problem):
    pg, y = he_problem
    K = grm_from_packed(pg)
    st = he_streamed(pg, y, probes=64, seed=1)
    # exact quantities must match tightly
    assert st.trace_k == pytest.approx(float(np.trace(K)), rel=1e-5)
    # Hutchinson tr(K^2) within stochastic tolerance
    assert st.trace_k2 == pytest.approx(float(np.sum(K * K)), rel=0.15)
    de = he_regression(K, y)
    assert st.h2 == pytest.approx(de.h2, abs=0.06)


def test_streamed_with_covariates(he_problem):
    pg, y = he_problem
    rng = np.random.default_rng(9)
    cov = rng.normal(size=(pg.n, 2))
    K = grm_from_packed(pg)
    st = he_streamed(pg, y, covariates=cov, probes=64, seed=2)
    de = he_regression(K, y, covariates=cov)
    assert st.h2 == pytest.approx(de.h2, abs=0.06)


def test_streamed_sample_subset(he_problem):
    pg, y = he_problem
    idx = np.arange(0, pg.n, 2)
    K = grm_from_packed(pg)
    Ks = K[np.ix_(idx, idx)]
    # the 2x2 HE solve is ill-conditioned at n=200, amplifying Hutchinson
    # noise ~20x into h2 — average over seeds with a large probe count
    # (the reference's PCG trace estimator carries the same stochasticity)
    sts = [he_streamed(pg, y, sample_idx=idx, probes=256, seed=s)
           for s in range(3)]
    de = he_regression(Ks, y[idx])
    assert sts[0].trace_k == pytest.approx(float(np.trace(Ks)), rel=1e-5)
    assert sts[0].trace_k2 == pytest.approx(float(np.sum(Ks * Ks)), rel=0.05)
    h2m = float(np.mean([s.h2 for s in sts]))
    assert h2m == pytest.approx(de.h2, abs=0.12)


def test_streamed_windowed_input(tmp_path):
    from janusx_tpu.io import plink
    from janusx_tpu.io.windowed import WindowedBed

    pg, y = _make_problem(seed=12, m=900, n=250)
    prefix = str(tmp_path / "hewin")
    codes = pg.dosages()
    plink.write_plink_genotypes(
        prefix, GenotypeData(codes, pg.sites, pg.samples)
    )
    win = WindowedBed(prefix, window=256).prepare(QcParams(maf=0.01, geno=0.05))
    st_w = he_streamed(win, y, probes=64, seed=4)
    st_m = he_streamed(pg, y, probes=64, seed=4)
    assert st_w.h2 == pytest.approx(st_m.h2, abs=0.05)
    assert st_w.trace_k == pytest.approx(st_m.trace_k, rel=1e-4)
