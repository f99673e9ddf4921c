"""Sparse biobank path: .jxgrm format, block-spectral solver, exact scan.

Reference analogs: src/stats/spgrm.rs (.jxgrm CSC), src/math/cholesky.rs
(sparse factorization), src/stats/splmm.rs (exact scan)."""

import numpy as np
import pytest
import scipy.sparse

from janusx_tpu.io.jxgrm import jxgrm_n_samples, read_jxgrm, write_jxgrm
from janusx_tpu.models.sparse_spectral import BlockSpectralK, profiled_null_fit


def _family_sparse_k(n, rng, fam=8, rel=0.3):
    """Symmetric PSD-ish sparse kinship with family blocks + singletons."""
    K = scipy.sparse.lil_matrix((n, n))
    K.setdiag(1.0 + 0.05 * rng.random(n))
    i = 0
    while i + fam <= n // 2:
        sz = int(rng.integers(2, fam + 1))
        for a in range(i, i + sz):
            for b in range(a + 1, i + sz):
                v = rel * rng.random()
                K[a, b] = v
                K[b, a] = v
        i += sz
    return K.tocsc()


def test_jxgrm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    K = _family_sparse_k(60, rng)
    path = str(tmp_path / "k.jxgrm")
    write_jxgrm(path, K)
    assert jxgrm_n_samples(path) == 60
    K2 = read_jxgrm(path)
    np.testing.assert_allclose(K2.toarray(), K.toarray(), atol=0)
    # header layout: u64 n, u64 nnz, per the reference byte spec
    raw = open(path, "rb").read()
    n_hdr = int(np.frombuffer(raw[:8], "<u8")[0])
    nnz_hdr = int(np.frombuffer(raw[8:16], "<u8")[0])
    assert n_hdr == 60
    assert nnz_hdr == scipy.sparse.tril(K).nnz
    # lower triangle only
    L = read_jxgrm(path, symmetrize=False)
    assert (L.tocoo().row >= L.tocoo().col).all()


def test_jxgrm_legacy_unpadded_layout(tmp_path):
    """nnz*4 not divisible by 8 -> padded file; strip the pad to emulate
    the legacy layout the reference also accepts (cholesky.rs:305-320)."""
    K = scipy.sparse.csc_matrix(np.array([[1.0, 0.2], [0.2, 1.0]]))
    path = str(tmp_path / "k.jxgrm")
    write_jxgrm(path, K)
    nnz = scipy.sparse.tril(K).nnz
    assert nnz % 2 == 1  # odd -> 4 pad bytes present
    raw = open(path, "rb").read()
    hdr_end = 16 + 3 * 8 + nnz * 4
    legacy = raw[:hdr_end] + raw[hdr_end + 4:]
    lp = str(tmp_path / "legacy.jxgrm")
    open(lp, "wb").write(legacy)
    K2 = read_jxgrm(lp)
    np.testing.assert_allclose(K2.toarray(), K.toarray())


def test_jxgrm_size_mismatch_rejected(tmp_path):
    K = scipy.sparse.identity(4, format="csc")
    path = str(tmp_path / "k.jxgrm")
    write_jxgrm(path, K)
    open(path, "ab").write(b"xx")
    with pytest.raises(ValueError, match="layout"):
        read_jxgrm(path)


class TestBlockSpectral:
    def setup_method(self):
        self.rng = np.random.default_rng(42)
        self.K = _family_sparse_k(97, self.rng)  # odd n, mixed comp sizes
        self.bs = BlockSpectralK.from_sparse(self.K)
        self.Kd = self.K.toarray()

    def test_logdet(self):
        for lbd in (0.01, 1.0, 37.0):
            expect = np.linalg.slogdet(self.Kd + lbd * np.eye(97))[1]
            assert self.bs.logdet(lbd) == pytest.approx(expect, rel=1e-10)

    def test_solve_and_quad(self):
        B = self.rng.normal(size=(97, 3))
        for lbd in (0.05, 2.0):
            V = self.Kd + lbd * np.eye(97)
            expect = np.linalg.solve(V, B)
            np.testing.assert_allclose(self.bs.solve(lbd, B), expect, rtol=1e-9)
            np.testing.assert_allclose(
                self.bs.solve(lbd, B[:, 0]), expect[:, 0], rtol=1e-9
            )
            np.testing.assert_allclose(
                self.bs.quad(lbd, B), np.einsum("nk,nk->k", B, expect), rtol=1e-9
            )

    def test_device_quad(self):
        G = self.rng.normal(size=(8, 97)).astype(np.float32)
        lbd = 0.7
        V = self.Kd + lbd * np.eye(97)
        expect = np.einsum("bn,bn->b", G, np.linalg.solve(V, G.T).T)
        got = np.asarray(self.bs.device_quad_fn(lbd)(G))
        np.testing.assert_allclose(got, expect, rtol=2e-4)

    def test_null_fit_matches_dense_spectral(self):
        # profiled fit via block-spectral == brute-force dense version
        y = self.rng.normal(size=97)
        n_eff = 95
        lbd, sigma2, _ = profiled_null_fit(self.bs, y, n_eff, -5.0, 5.0)

        import scipy.optimize

        s, U = np.linalg.eigh(self.Kd)
        yr2 = (U.T @ y) ** 2

        def nll(lg):
            l = 10.0 ** lg
            quad = float(np.sum(yr2 / (s + l)))
            return 0.5 * (n_eff * np.log(quad) + np.sum(np.log(s + l)))

        ref = scipy.optimize.minimize_scalar(
            nll, bounds=(-5.0, 5.0), method="bounded",
            options={"xatol": 1e-6, "maxiter": 100},
        )
        assert np.log10(lbd) == pytest.approx(float(ref.x), abs=1e-3)


@pytest.fixture(scope="module")
def geno_problem():
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.io.packed import QcParams, pack_genotypes
    from janusx_tpu.models.grm import grm_from_packed

    rng = np.random.default_rng(7)
    m, n = 400, 150
    p = rng.uniform(0.05, 0.5, size=m)
    g = rng.binomial(2, p[:, None], size=(m, n)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(m, dtype=np.int64) + 1,
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )
    gd = GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object))
    pg = pack_genotypes(gd, QcParams())
    K = grm_from_packed(pg)
    y = rng.normal(size=n) + pg.centered()[7] * 0.8
    return pg, K, y


def test_exact_scan_matches_dense_reference(geno_problem):
    """splmm_exact_scan vs a direct dense implementation of the reference
    formulas (splmm.rs:1-9) at the SAME lambda."""
    from janusx_tpu.models.splmm import sparsify_grm, splmm_exact_scan

    pg, K, y = geno_problem
    n = pg.n
    cov = np.random.default_rng(1).normal(size=(n, 2))
    res, info = splmm_exact_scan(pg, K, y, covariates=cov, cutoff=0.05)

    Ks = sparsify_grm(K, 0.05).toarray()
    V = Ks + info["lambda_null"] * np.eye(n)
    Vi = np.linalg.inv(V)
    X = np.concatenate([np.ones((n, 1)), cov], axis=1)
    P = Vi - Vi @ X @ np.linalg.solve(X.T @ Vi @ X, X.T @ Vi)
    sigma2 = float(y @ P @ y) / (n - X.shape[1] - 1)
    G = pg.centered()
    gPg = np.einsum("kn,nm,km->k", G, P, G)
    gPy = G @ (P @ y)
    beta = gPy / gPg
    se = np.sqrt(sigma2 / gPg)
    np.testing.assert_allclose(res.beta, beta, rtol=5e-4)
    np.testing.assert_allclose(res.se, se, rtol=5e-4)
    assert info["sigma2"] == pytest.approx(sigma2, rel=1e-6)
    assert np.isfinite(res.pwald).all()


def test_grammar_scan_sparse_input_matches_dense_input(geno_problem):
    from janusx_tpu.models.splmm import sparsify_grm, splmm_grammar_scan

    pg, K, y = geno_problem
    r_dense, i_dense = splmm_grammar_scan(pg, K, y, cutoff=0.05)
    r_sparse, i_sparse = splmm_grammar_scan(pg, sparsify_grm(K, 0.05), y)
    assert i_dense["lambda_null"] == pytest.approx(i_sparse["lambda_null"])
    np.testing.assert_allclose(r_sparse.beta, r_dense.beta, rtol=1e-9)
    np.testing.assert_allclose(r_sparse.pwald, r_dense.pwald, rtol=1e-9)


def test_workflow_sparse_only_never_builds_dense_grm(geno_problem, tmp_path, monkeypatch):
    """-splmm/-splmm-exact end-to-end: dense GRM must never be formed;
    the .jxgrm cache is written and hit on re-run."""
    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData
    from janusx_tpu.workflows.gwas import GwasConfig, run_gwas
    import janusx_tpu.models.grm as grm_mod
    import janusx_tpu.utils.cache as cache_mod

    pg, K, y = geno_problem
    gd = GenotypeData(
        np.asarray(pg.dosages(), np.int8), pg.sites, pg.samples
    )
    prefix = str(tmp_path / "toy")
    plink.write_plink_genotypes(prefix, gd)
    pheno = tmp_path / "t.pheno"
    with open(pheno, "wt") as fh:
        fh.write("id\ty\n")
        for s, v in zip(pg.samples, y):
            fh.write(f"{s}\t{v:.6f}\n")

    def boom(*a, **k):
        raise AssertionError("dense GRM built on sparse-only route")

    monkeypatch.setattr(grm_mod, "grm_from_packed", boom)
    monkeypatch.setattr(cache_mod, "load_or_build_grm", boom)
    runs = run_gwas(GwasConfig(
        genotype=prefix + ".bed", phenotype=str(pheno),
        out_prefix=str(tmp_path / "o"), models=("splmm", "splmm-exact"),
        force_model=True, n_devices=1,
    ))
    assert len(runs) == 2
    for r in runs:
        assert np.isfinite(r.result.pwald).all()
        assert r.lambda_null is not None
    jx = [f for f in os.listdir(tmp_path) if f.endswith(".jxgrm")]
    assert len(jx) == 1
    # cache hit on re-run
    runs2 = run_gwas(GwasConfig(
        genotype=prefix + ".bed", phenotype=str(pheno),
        out_prefix=str(tmp_path / "o2"), models=("splmm",),
        force_model=True, n_devices=1,
    ))
    np.testing.assert_allclose(
        runs2[0].result.pwald, runs[0].result.pwald, rtol=1e-12
    )


import os


def test_build_sparse_grm_windowed_input(tmp_path):
    """Band-streamed sparse GRM from a disk-backed WindowedPacked matches
    the in-RAM build exactly."""
    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.io.packed import QcParams, pack_genotypes
    from janusx_tpu.io.windowed import WindowedBed
    from janusx_tpu.models.splmm import build_sparse_grm

    rng = np.random.default_rng(9)
    m, n = 600, 130
    p = rng.uniform(0.05, 0.5, size=m)
    g = rng.binomial(2, p[:, None], size=(m, n)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(m, dtype=np.int64) + 1,
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )
    gd = GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object))
    prefix = str(tmp_path / "w")
    plink.write_plink_genotypes(prefix, gd)
    ram = pack_genotypes(gd, QcParams())
    wp = WindowedBed(prefix, window=113).prepare(QcParams())
    wp.max_resident_snps = 128
    K1 = build_sparse_grm(ram, cutoff=0.05, row_band=64)
    K2 = build_sparse_grm(wp, cutoff=0.05, row_band=64)
    np.testing.assert_allclose(K2.toarray(), K1.toarray(), rtol=2e-3, atol=1e-9)


def test_block_spectral_indefinite_clamped():
    """Thresholded-K components can go indefinite: eigenvalues clamp to
    the PSD projection instead of silently corrupting logdet/solve."""
    import scipy.sparse

    from janusx_tpu.models.sparse_spectral import BlockSpectralK

    K = np.array([[1.0, 0.9, 0.0], [0.9, 1.0, 0.9], [0.0, 0.9, 1.0]])
    assert np.linalg.eigvalsh(K)[0] < 0  # genuinely indefinite
    bs = BlockSpectralK.from_sparse(scipy.sparse.csc_matrix(K))
    assert bs.svals_concat().min() >= 0
    want = float(np.sum(np.log(np.clip(np.linalg.eigvalsh(K), 0, None) + 0.5)))
    assert bs.logdet(0.5) == pytest.approx(want, abs=1e-8)


def test_farmcpu_zero_loops():
    """--farmcpu-iter 0 runs the final scan without a QTN loop."""
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.io.packed import QcParams, pack_genotypes
    from janusx_tpu.models.farmcpu import farmcpu_scan, farmcpu_unified_scan

    rng = np.random.default_rng(0)
    m, n = 100, 60
    g = rng.integers(0, 3, (m, n)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object), pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object), allele1=np.array(["G"] * m, object),
    )
    pg = pack_genotypes(
        GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object)),
        QcParams(maf=0.0, geno=1.0))
    y = rng.normal(size=n)
    assert farmcpu_scan(pg, y, max_loops=0).loops == 0
    assert farmcpu_unified_scan(pg, y, max_loops=0).loops == 0


class TestPercolationGuard:
    """A loose cutoff can percolate the relatedness graph into one giant
    component; the dense-eigh budget (JX_TPU_SPARSE_MAX_DENSE_COMP) must
    reroute it through per-lambda sparse-LU factors in bounded memory
    (reference robustness analog: AMD-ordered sparse LLT handles any
    pattern, src/math/cholesky.rs:31-45)."""

    @staticmethod
    def _chain_k(n, rng, lo=0):
        """One giant tridiagonal component spanning samples [lo, lo+n)."""
        off = 0.2 + 0.1 * rng.random(n - 1)
        return scipy.sparse.diags(
            [off, 1.0 + 0.05 * rng.random(n), off], offsets=(-1, 0, 1),
            format="csc",
        )

    def test_lu_route_matches_dense_spectral(self):
        rng = np.random.default_rng(3)
        n = 257
        K = self._chain_k(n, rng)
        bs_lu = BlockSpectralK.from_sparse(K, max_dense_comp=64)
        assert bs_lu.sparse_comps and not bs_lu.buckets
        assert bs_lu.max_comp == n
        bs_dn = BlockSpectralK.from_sparse(K, max_dense_comp=n)
        assert not bs_dn.sparse_comps
        B = rng.normal(size=(n, 3))
        for lbd in (0.05, 1.0, 20.0):
            assert bs_lu.logdet(lbd) == pytest.approx(
                bs_dn.logdet(lbd), rel=1e-10)
            np.testing.assert_allclose(
                bs_lu.solve(lbd, B), bs_dn.solve(lbd, B), rtol=1e-7,
                atol=1e-10)
            np.testing.assert_allclose(
                bs_lu.quad(lbd, B), bs_dn.quad(lbd, B), rtol=1e-8)
        y = rng.normal(size=n)
        fit_lu = profiled_null_fit(bs_lu, y, n - 1, -5.0, 5.0)
        fit_dn = profiled_null_fit(bs_dn, y, n - 1, -5.0, 5.0)
        assert np.log10(fit_lu[0]) == pytest.approx(
            np.log10(fit_dn[0]), abs=1e-5)
        assert fit_lu[1] == pytest.approx(fit_dn[1], rel=1e-6)
        with pytest.raises(ValueError, match="sparse-LU"):
            bs_lu.device_quad_fn(0.5)

    def test_mixed_giant_plus_families(self):
        """Giant chain + small family blocks + singletons coexist: the
        guard must split representations without double counting."""
        rng = np.random.default_rng(5)
        giant = self._chain_k(120, rng)
        fams = _family_sparse_k(77, rng)
        K = scipy.sparse.block_diag([giant, fams], format="csc")
        n = K.shape[0]
        bs = BlockSpectralK.from_sparse(K, max_dense_comp=64)
        assert len(bs.sparse_comps) == 1 and bs.buckets
        Kd = K.toarray()
        for lbd in (0.3, 4.0):
            want = np.linalg.slogdet(Kd + lbd * np.eye(n))[1]
            assert bs.logdet(lbd) == pytest.approx(want, rel=1e-10)
            B = rng.normal(size=(n, 2))
            np.testing.assert_allclose(
                bs.solve(lbd, B), np.linalg.solve(Kd + lbd * np.eye(n), B),
                rtol=1e-7, atol=1e-10)

    def test_percolated_scans_end_to_end(self, geno_problem, monkeypatch):
        """-splmm / -splmm-exact under a percolated kinship: the guarded
        run must match the dense-spectral run's numbers."""
        from janusx_tpu.models.splmm import (
            splmm_exact_scan, splmm_grammar_scan,
        )

        pg, _, y = geno_problem
        rng = np.random.default_rng(8)
        K = self._chain_k(pg.n, rng)
        r_dn, i_dn = splmm_exact_scan(pg, K, y)
        g_dn, gi_dn = splmm_grammar_scan(pg, K, y)
        monkeypatch.setenv("JX_TPU_SPARSE_MAX_DENSE_COMP", "32")
        r_lu, i_lu = splmm_exact_scan(pg, K, y)
        g_lu, gi_lu = splmm_grammar_scan(pg, K, y)
        assert i_lu["lambda_null"] == pytest.approx(
            i_dn["lambda_null"], rel=1e-5)
        np.testing.assert_allclose(r_lu.beta, r_dn.beta, rtol=2e-4)
        np.testing.assert_allclose(r_lu.se, r_dn.se, rtol=2e-4)
        assert gi_lu["lambda_null"] == pytest.approx(
            gi_dn["lambda_null"], rel=1e-5)
        np.testing.assert_allclose(g_lu.beta, g_dn.beta, rtol=1e-6)

    def test_giant_component_20k_bounded(self):
        """n=20,000 one-component kinship: the null fit + exact scan
        complete through the LU route (a dense eigh here would be
        O(n^3) minutes and a 3.2 GB basis — the pre-guard failure mode)."""
        from janusx_tpu.io.gdata import GenotypeData, SiteInfo
        from janusx_tpu.io.packed import QcParams, pack_genotypes
        from janusx_tpu.models.splmm import (
            fit_sparse_null, splmm_exact_scan, splmm_grammar_scan,
        )

        rng = np.random.default_rng(21)
        n, m = 20_000, 64
        K = self._chain_k(n, rng)
        null = fit_sparse_null(K, rng.normal(size=n), n - 1)
        assert null.factor.bs.sparse_comps
        assert np.isfinite(null.loglik)

        g = rng.binomial(2, 0.3, size=(m, n)).astype(np.int8)
        sites = SiteInfo(
            chrom=np.array(["1"] * m, object),
            pos=np.arange(1, m + 1, dtype=np.int64),
            snp=np.array([f"s{i}" for i in range(m)], object),
            allele0=np.array(["A"] * m, object),
            allele1=np.array(["G"] * m, object),
        )
        pg = pack_genotypes(
            GenotypeData(g, sites,
                         np.array([f"i{j}" for j in range(n)], object)),
            QcParams(maf=0.0, geno=1.0))
        y = rng.normal(size=n) + pg.centered()[5] * 0.5
        res, info = splmm_exact_scan(pg, K, y)
        assert np.isfinite(res.pwald).all()
        gres, _ = splmm_grammar_scan(pg, K, y)
        assert np.isfinite(gres.pwald).all()
