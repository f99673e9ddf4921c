"""Round-5 metamorphic/property extensions.

The round-4 metamorphic suite (tests/test_metamorphic.py) found two real
f32 precision bugs; this file applies the same self-adversarial style to
the components round 5 added or rebuilt: the adam-em admixture solver,
the ME starting tree, the distributed GRM/scan drivers, and the sorted
k-mer phase 2.
"""

from __future__ import annotations

import numpy as np
import pytest

from janusx_tpu.io.gdata import GenotypeData, SiteInfo
from janusx_tpu.io.packed import QcParams, pack_genotypes


def _sites(m):
    return SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )


def _pack(codes):
    m = codes.shape[0]
    gd = GenotypeData(codes.astype(np.int8), _sites(m),
                      np.array([f"i{j}" for j in range(codes.shape[1])],
                               object))
    return pack_genotypes(gd, QcParams(maf=0.0, geno=1.0))


def test_adam_em_allele_flip_leaves_q_invariant():
    """Flipping the allele coding of a SNP subset (g -> 2-g) re-labels
    the corresponding P rows but must leave the inferred ancestry Q
    essentially unchanged — the likelihood is invariant, only the
    parameterization flips."""
    from janusx_tpu.models.fastpop import train_admixture

    rng = np.random.default_rng(8)
    m, n, K = 500, 120, 2
    P = rng.uniform(0.1, 0.9, (K, m))
    Q = rng.dirichlet(np.full(K, 0.5), size=n)
    g = rng.binomial(2, Q @ P).T.astype(np.int8)
    flip = rng.random(m) < 0.5
    g2 = g.copy()
    g2[flip] = 2 - g2[flip]

    fit1 = train_admixture(_pack(g), K, n_iter=300, seed=3,
                           solver="adam-em", tol=1e-6, check_every=5)
    fit2 = train_admixture(_pack(g2), K, n_iter=300, seed=3,
                           solver="adam-em", tol=1e-6, check_every=5)
    # align component permutation, then Q must agree closely
    d_direct = np.abs(fit1.Q - fit2.Q).mean()
    d_swap = np.abs(fit1.Q - fit2.Q[:, ::-1]).mean()
    assert min(d_direct, d_swap) < 0.02, (d_direct, d_swap)


def test_me_start_label_permutation_equivariance():
    """me_nni_start is equivariant under consistent relabeling of leaves
    and distance-matrix rows: the output trees carry identical split
    sets."""
    from janusx_tpu.models.mltree import me_nni_start
    from janusx_tpu.models.tree import _tree_splits, neighbor_joining

    rng = np.random.default_rng(4)
    n = 14
    X = rng.normal(size=(n, 6))
    X[: n // 2] += 2.5  # two clusters
    D = np.sqrt(((X[:, None] - X[None]) ** 2).sum(-1))
    names = [f"L{i}" for i in range(n)]
    perm = rng.permutation(n)
    D2 = D[np.ix_(perm, perm)]
    names2 = [names[i] for i in perm]

    t1 = me_nni_start(neighbor_joining(D, names), D, names)
    t2 = me_nni_start(neighbor_joining(D2, names2), D2, names2)

    def splits(nwk):
        return {frozenset(s) for s in _tree_splits(nwk)}

    assert splits(t1) == splits(t2)


def test_distributed_grm_sample_permutation_equivariance(rng):
    """distributed_grm commutes with sample permutation: K(perm(X)) ==
    perm-rows/cols of K(X)."""
    from janusx_tpu.parallel import distributed as dist

    m, n = 160, 40
    codes = rng.integers(0, 3, size=(m, n)).astype(np.int8)
    pg = _pack(codes)
    perm = rng.permutation(n)
    pg_p = _pack(codes[:, perm])
    K = dist.distributed_grm(pg)
    Kp = dist.distributed_grm(pg_p)
    np.testing.assert_allclose(Kp, K[np.ix_(perm, perm)],
                               rtol=1e-12, atol=1e-12)


def test_distributed_scan_constant_shift_invariance(rng):
    """distributed_scan(lm) p-values are invariant to a constant
    phenotype shift (the intercept absorbs it) — the round-4 mean-leak
    bug class, checked through the distributed driver."""
    from janusx_tpu.models.lm import lm_scan
    from janusx_tpu.parallel import distributed as dist

    m, n = 180, 50
    codes = rng.integers(0, 3, size=(m, n)).astype(np.int8)
    pg = _pack(codes)
    y = rng.normal(size=n)
    r1 = dist.distributed_scan(pg, lambda sub: lm_scan(sub, y))
    r2 = dist.distributed_scan(pg, lambda sub: lm_scan(sub, y + 1000.0))
    ok = np.isfinite(r1.pwald) & (r1.pwald > 0)
    dlogp = np.abs(np.log10(r1.pwald[ok]) - np.log10(r2.pwald[ok]))
    assert np.nanmax(dlogp) < 5e-3


def test_kmer_read_order_shuffle_byte_identical(tmp_path):
    """Shuffling read order must produce a byte-identical sorted count
    table (the sorted phase 2's partition merge is order-free)."""
    from janusx_tpu.models import kmer

    if not kmer.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(12)
    reads = []
    for i in range(600):
        s = "".join("ACGT"[b] for b in rng.integers(0, 4, 90))
        reads.append(f"@r{i}\n{s}\n+\n{'I' * 90}\n")
    fa = tmp_path / "a.fastq"
    fa.write_text("".join(reads))
    rng.shuffle(reads)
    fb = tmp_path / "b.fastq"
    fb.write_text("".join(reads))
    c1, n1 = kmer.count_kmers(str(fa), k=17)
    c2, n2 = kmer.count_kmers(str(fb), k=17)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(n1, n2)


def test_gs_ml_params_do_not_leak_across_methods(gs_tmp_factory=None):
    """ml_params given for one run must not mutate the shared defaults
    (set_params on a fresh estimator each call)."""
    from janusx_tpu.gs.workflow import _ml_model

    a = _ml_model("RF", 1, {"n_estimators": 10})
    b = _ml_model("RF", 1)
    assert a.get_params()["n_estimators"] == 10
    assert b.get_params()["n_estimators"] == 300  # library default intact
