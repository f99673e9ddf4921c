"""FastPop / ADMIXTURE tests."""

import numpy as np
import pytest

from janusx_tpu.io.gdata import GenotypeData, SiteInfo
from janusx_tpu.io.packed import QcParams, pack_genotypes
from janusx_tpu.models.fastpop import train_admixture


@pytest.fixture(scope="module")
def structured_pops():
    rng = np.random.default_rng(17)
    m, n_half = 600, 80
    p1 = rng.uniform(0.05, 0.95, m)
    p2 = np.clip(p1 + rng.choice([-1, 1], m) * rng.uniform(0.2, 0.5, m), 0.02, 0.98)
    g = np.concatenate(
        [
            rng.binomial(2, p1[:, None], (m, n_half)),
            rng.binomial(2, p2[:, None], (m, n_half)),
        ],
        axis=1,
    ).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object), pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object), allele1=np.array(["G"] * m, object),
    )
    gd = GenotypeData(g, sites, np.array([f"i{j}" for j in range(2 * n_half)], object))
    return pack_genotypes(gd, QcParams(maf=0.02, geno=0.1)), n_half


def test_admixture_separates_populations(structured_pops):
    pg, n_half = structured_pops
    fit = train_admixture(pg, 2, n_iter=250, seed=1)
    assert fit.Q.shape == (pg.n, 2)
    np.testing.assert_allclose(fit.Q.sum(axis=1), 1.0, atol=1e-5)
    # monotone improvement of loglik over the tail of optimization
    assert fit.loglik_path[-1] > fit.loglik_path[10]
    # each true population should be dominated by one component
    comp1 = fit.Q[:n_half].mean(axis=0)
    comp2 = fit.Q[n_half:].mean(axis=0)
    k1 = int(np.argmax(comp1))
    assert comp1[k1] > 0.8
    assert comp2[1 - k1] > 0.8


def test_king_kinship_and_unrelated_set(rng):
    from janusx_tpu.models.king import king_kinship, unrelated_set

    m, n = 500, 60
    p = rng.uniform(0.2, 0.8, m)
    g = rng.binomial(2, p[:, None], (m, n)).astype(np.int8)
    # make samples 0/1 "full sibs" by copying half the genome
    g[: m // 2, 1] = g[: m // 2, 0]
    # and 2/3 duplicates (monozygotic)
    g[:, 3] = g[:, 2]
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object), pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object), allele1=np.array(["G"] * m, object),
    )
    pg = pack_genotypes(
        GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object)),
        QcParams(maf=0.05, geno=0.1),
    )
    phi = king_kinship(pg)
    assert phi.shape == (n, n)
    # duplicates ~0.5, constructed relatives elevated, unrelateds ~0
    assert phi[2, 3] > 0.4
    assert phi[0, 1] > 0.1
    assert abs(phi[10, 40]) < 0.1
    keep = unrelated_set(phi)
    assert not (2 in keep and 3 in keep)
    assert not (0 in keep and 1 in keep)
    # sampling noise in phi (m~500) can push a few random pairs over the
    # threshold; the pruned set should still retain most samples
    assert len(keep) >= n - 10


def test_treeplot_cli(tmp_path):
    from janusx_tpu.cli.main import main as jx_main

    nwk = tmp_path / "t.nwk"
    nwk.write_text("((a:0.1,b:0.2):0.05,(c:0.1,d:0.12):0.1);\n")
    rc = jx_main(["treeplot", "-i", str(nwk), "-o", str(tmp_path), "-prefix", "tp"])
    assert rc == 0
    assert (tmp_path / "tp.tree.png").exists()


def test_run_history(tmp_path, monkeypatch):
    monkeypatch.setenv("JX_TPU_HISTORY_DB", str(tmp_path / "h.db"))
    from janusx_tpu.utils.history import list_runs, record_run

    record_run("gwas", "/tmp/x", {"models": ["lmm"]}, ["a.tsv"], 1.5)
    rows = list_runs()
    assert len(rows) == 1 and rows[0][1] == "gwas"


def test_king_tiled_matches_dense(rng):
    """Tiled sparse related-pair sweep == dense kinship + threshold
    (reference KING.rs streaming pair graph)."""
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.io.packed import QcParams, pack_genotypes
    from janusx_tpu.models.king import (
        DEGREE2_THRESHOLD,
        king_kinship,
        king_related_pairs,
        unrelated_set,
        unrelated_set_from_pairs,
    )
    from janusx_tpu.models.sim import simulate_genotypes

    gd = simulate_genotypes(220, 900, seed=9, structure="mixed",
                            family_size=5, family_frac=0.4)
    pg = pack_genotypes(gd, QcParams(maf=0.01))
    phi = king_kinship(pg)
    ii, jj, vv = king_related_pairs(pg, tile=64)  # force many tile pairs
    dense_pairs = {
        (i, j) for i, j in zip(*np.nonzero(np.triu(phi, 1) > DEGREE2_THRESHOLD))
    }
    assert {(int(i), int(j)) for i, j in zip(ii, jj)} == dense_pairs
    got = dict(zip(zip(ii, jj), vv))
    for (i, j), v in got.items():
        assert v == pytest.approx(phi[i, j], rel=1e-5)
    # family structure must produce related pairs and pruning must act
    assert len(ii) > 10
    keep_sparse = unrelated_set_from_pairs(ii, jj, pg.n)
    keep_dense = unrelated_set(phi)
    np.testing.assert_array_equal(keep_sparse, keep_dense)


def test_ld_prune_pairwise_complete_r2(rng):
    """r² with missing calls must be pairwise-complete (ld.rs:211,357), not
    zero-filled; and a bp-window anchor with no in-window neighbor stays
    untested (ld.rs `if end <= li + 1 { continue; }`)."""
    from janusx_tpu.models.ldprune import _r2_chunk_pairwise, ld_prune
    from janusx_tpu.ops import decode

    m, n = 40, 400
    p = rng.uniform(0.2, 0.5, size=m)
    g = rng.binomial(2, p[:, None], size=(m, n)).astype(np.int8)
    g[1] = np.where(rng.random(n) < 0.1, 2 - g[0], g[0])  # high LD pair
    g[rng.random((m, n)) < 0.15] = -1  # 15% missing
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object), pos=np.arange(1, m + 1, dtype=np.int64) * 100,
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object), allele1=np.array(["G"] * m, object),
    )
    pg = pack_genotypes(GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object)),
                        QcParams(maf=0.0, geno=1.0))
    import jax.numpy as jnp

    r2 = np.asarray(_r2_chunk_pairwise(jnp.asarray(decode.pad_packed_cols(pg.packed))))
    d = pg.dosages().astype(float)
    d[d < 0] = np.nan
    for i, j in [(0, 1), (3, 17), (5, 30)]:
        ok = np.isfinite(d[i]) & np.isfinite(d[j])
        expect = np.corrcoef(d[i][ok], d[j][ok])[0, 1] ** 2
        assert r2[i, j] == pytest.approx(expect, abs=1e-5)
    # the high-LD pair must be pruned despite missingness
    keep = ld_prune(pg, window=10, step=1, r2_threshold=0.2)
    assert (0 in keep) != (1 in keep)


def test_ld_prune_sparse_bp_window_keeps_isolated_pairs(rng):
    """Two correlated SNPs farther apart than window_bp are both kept."""
    from janusx_tpu.models.ldprune import ld_prune

    n = 300
    g0 = rng.binomial(2, 0.4, size=n).astype(np.int8)
    g = np.stack([g0, g0.copy()])  # perfectly correlated
    sites = SiteInfo(
        chrom=np.array(["1", "1"], object),
        pos=np.array([1_000, 2_000_000], dtype=np.int64),  # 2 Mb apart
        snp=np.array(["a", "b"], object),
        allele0=np.array(["A", "A"], object), allele1=np.array(["G", "G"], object),
    )
    pg = pack_genotypes(GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object)),
                        QcParams(maf=0.0, geno=1.0))
    keep = ld_prune(pg, step=1, r2_threshold=0.2, window_bp=100_000)
    assert keep.tolist() == [0, 1]
    # same pair inside the window is pruned to one
    sites2 = SiteInfo(
        chrom=sites.chrom, pos=np.array([1_000, 2_000], dtype=np.int64),
        snp=sites.snp, allele0=sites.allele0, allele1=sites.allele1,
    )
    pg2 = pack_genotypes(GenotypeData(g, sites2, pg.samples), QcParams(maf=0.0, geno=1.0))
    keep2 = ld_prune(pg2, step=1, r2_threshold=0.2, window_bp=100_000)
    assert len(keep2) == 1


def test_fastpop_early_stop_and_kspec(tmp_path):
    """-tol/-check early stopping (reference adamixture -check/-tol) and
    the multi-K -k spec parser."""
    import numpy as np

    from janusx_tpu.cli.fastpop import parse_k_spec
    from janusx_tpu.io.gdata import GenotypeData
    from janusx_tpu.io.packed import QcParams, pack_genotypes
    from janusx_tpu.models.fastpop import train_admixture
    from janusx_tpu.models.sim import simulate_genotypes

    assert parse_k_spec("8") == [8]
    assert parse_k_spec("1..5") == [1, 2, 3, 4, 5]
    assert parse_k_spec("1:5") == [1, 2, 3, 4, 5]
    assert parse_k_spec("1..10..3") == [1, 4, 7, 10]
    assert parse_k_spec("1:10:3") == [1, 4, 7, 10]
    assert parse_k_spec("2,5,8") == [2, 5, 8]

    gd = simulate_genotypes(120, 400, seed=5, structure="mixed")
    pg = pack_genotypes(gd, QcParams(maf=0.05, geno=0.1))
    full = train_admixture(pg, 2, n_iter=300, seed=1)
    early = train_admixture(pg, 2, n_iter=300, seed=1, tol=1e-3,
                            check_every=10)
    assert early.n_iter < full.n_iter  # converged before the cap
    assert len(early.loglik_path) == early.n_iter
    # early-stopped fit still lands near the full fit's likelihood
    assert early.loglik > full.loglik - abs(full.loglik) * 0.01


# -- adam-em solver (reference default; VERDICT r4 item 4) ------------------

GOLDEN_ADAM_EM_CV = 0.9291844625567625  # CPU backend, jax 0.9, seed 0


@pytest.fixture(scope="module")
def planted_admixture():
    """Planted 3-way admixture: P ~ U(0.05,0.95), Q ~ Dirichlet(0.4),
    g ~ Binomial(2, QP)."""
    rng = np.random.default_rng(5)
    m, n, K = 800, 150, 3
    P = rng.uniform(0.05, 0.95, (K, m))
    Q = rng.dirichlet(np.full(K, 0.4), size=n)
    g = rng.binomial(2, Q @ P).T.astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )
    gd = GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object))
    return pack_genotypes(gd, QcParams(maf=0.0, geno=1.0)), Q, K


def _q_rmse(Qh, Q, K):
    import itertools

    return min(
        float(np.sqrt(((Qh[:, perm] - Q) ** 2).mean()))
        for perm in itertools.permutations(range(K))
    )


def test_adam_em_recovers_planted_admixture(planted_admixture):
    pg, Q, K = planted_admixture
    fit = train_admixture(pg, K, n_iter=600, seed=2, solver="adam-em",
                          tol=1e-6, check_every=5)
    assert fit.solver == "adam-em"
    np.testing.assert_allclose(fit.Q.sum(axis=1), 1.0, atol=1e-5)
    assert _q_rmse(fit.Q, Q, K) < 0.06
    # loglik improves over the run and the early-stop engaged
    assert fit.loglik_path[-1] > fit.loglik_path[2]
    assert fit.n_iter < 600


def test_adam_em_at_least_matches_adam(planted_admixture):
    """The reference makes adam-em the default because the EM direction
    converges harder; from the same init it must reach at least the
    Adam-only loglik on the planted panel, in fewer iterations."""
    pg, Q, K = planted_admixture
    em = train_admixture(pg, K, n_iter=600, seed=2, solver="adam-em",
                         tol=1e-6, check_every=5)
    ad = train_admixture(pg, K, n_iter=600, seed=2, solver="adam",
                         tol=1e-6, check_every=5)
    assert em.loglik >= ad.loglik - 1.0
    assert em.n_iter <= ad.n_iter


def test_em_targets_match_dense_numpy(planted_admixture):
    """The blocked/packed device EM sweep (scan over 2-bit blocks, pad
    rows, masked cells) equals a direct dense-numpy EM step."""
    import jax
    import jax.numpy as jnp

    from janusx_tpu.models.fastpop import _em_targets_and_loglik
    from janusx_tpu.utils import devcache

    pg, _, K = planted_admixture
    rng = np.random.default_rng(11)
    m, n = pg.m, pg.n
    block = 256
    m_pad = -(-m // block) * block
    P0 = rng.uniform(0.1, 0.9, (m_pad, K)).astype(np.float32)
    Q0 = rng.dirichlet(np.ones(K), size=n).astype(np.float32)
    pk = devcache.device_packed(pg, m_pad)
    nblk = m_pad // block
    p_em, t, ll = jax.jit(_em_targets_and_loglik, static_argnames=("n",))(
        jnp.asarray(P0).reshape(nblk, block, K), jnp.asarray(Q0),
        jnp.asarray(pk).reshape(nblk, block, -1), n)
    p_em = np.asarray(p_em).reshape(m_pad, K)

    # dense reference
    g = pg.dosages().astype(np.float64)  # (m, n), -1 missing
    mask = g >= 0
    F = np.clip(P0[:m].astype(np.float64) @ Q0.T.astype(np.float64),
                1e-6, 1 - 1e-6)
    AA = np.where(mask, np.where(mask, g, 0) / F, 0.0)
    BB = np.where(mask, (2 - np.where(mask, g, 0)) / (1 - F), 0.0)
    a = AA @ Q0
    b = BB @ Q0
    denom = P0[:m] * (a - b) + b
    p_ref = np.where(np.abs(denom) < 1e-8, P0[:m], a * P0[:m] / denom)
    t_ref = (AA - BB).T @ P0[:m] + BB.sum(axis=0)[:, None]
    ll_ref = np.sum(np.where(mask, np.where(mask, g, 0) * np.log(F)
                             + (2 - np.where(mask, g, 0)) * np.log1p(-F), 0.0))

    np.testing.assert_allclose(p_em[:m], p_ref, rtol=2e-4, atol=2e-5)
    # padding rows are EM fixed points (all-missing => p_em == p)
    np.testing.assert_allclose(p_em[m:], P0[m:], rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(t), t_ref, rtol=2e-3, atol=2e-2)
    assert abs(float(ll) - ll_ref) / abs(ll_ref) < 1e-4


def test_adam_em_cv_error_frozen_seed(structured_pops):
    """Frozen-seed CV-deviance golden for the adam-em route (the model-
    selection statistic `jx fastpop -cv` reports)."""
    from janusx_tpu.models.fastpop import cv_error

    pg, _ = structured_pops
    dev = cv_error(pg, 2, seed=0, n_iter=200, solver="adam-em",
                   tol=1e-5, check_every=5)
    assert np.isfinite(dev) and 0 < dev < 10
    # frozen golden (CPU backend, jax 0.9): re-freeze only with a
    # documented semantics change
    assert abs(dev - GOLDEN_ADAM_EM_CV) / GOLDEN_ADAM_EM_CV < 5e-3, dev
