"""Signed feature hashing tests (reference src/stats/packed.rs
bed_packed_signed_hash_f32 + splitmix64 bucket/sign)."""

import numpy as np
import pytest

from janusx_tpu.models.hashing import (
    _splitmix64,
    hash_bucket_sign,
    signed_hash_features,
)


def _splitmix64_scalar(x: int) -> int:
    """Independent scalar splitmix64 (textbook constants) for cross-check."""
    mask = (1 << 64) - 1
    x = (x + 0x9E3779B97F4A7C15) & mask
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
    return (z ^ (z >> 31)) & mask


def test_splitmix64_matches_scalar_reference():
    xs = np.array([0, 1, 42, 2**63, 2**64 - 1], np.uint64)
    got = _splitmix64(xs)
    want = [_splitmix64_scalar(int(x)) for x in xs]
    assert [int(v) for v in got] == want


def test_bucket_sign_deterministic_and_mirrors_reference_algorithm():
    idx = np.arange(1000)
    b1, s1 = hash_bucket_sign(520, idx, 256)
    b2, s2 = hash_bucket_sign(520, idx, 256)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(s1, s2)
    # scalar mirror of packed.rs:33-41
    mask = (1 << 64) - 1
    for j in [0, 7, 999]:
        key = (j * 0x9E3779B97F4A7C15) & mask
        want_b = _splitmix64_scalar(520 ^ key) % 256
        rot = ((key << 17) | (key >> 47)) & mask
        want_s = 1.0 if (_splitmix64_scalar((520 + 0x517CC1B727220A95) ^ rot) & 1) == 0 else -1.0
        assert int(b1[j]) == want_b
        assert float(s1[j]) == want_s
    # buckets roughly uniform, signs roughly balanced
    counts = np.bincount(b1, minlength=256)
    assert counts.max() < 20
    assert abs(s1.mean()) < 0.15


@pytest.fixture(scope="module")
def hash_problem():
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.io.packed import QcParams, pack_genotypes

    rng = np.random.default_rng(17)
    m, n = 500, 200
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
    return pack_genotypes(gd, QcParams(maf=0.01, geno=0.05))


def test_hashed_grm_approximates_standardized_grm(hash_problem):
    from janusx_tpu.models.grm import grm_from_packed

    pg = hash_problem
    H, scale, kept = signed_hash_features(pg, n_buckets=4096, seed=520)
    assert H.shape == (pg.n, 4096)
    assert kept == pg.m
    Kh = H.astype(np.float64) @ H.T.astype(np.float64)
    assert np.mean(np.diag(Kh)) == pytest.approx(1.0, rel=1e-4)
    K2 = grm_from_packed(pg, method=2)
    iu = np.triu_indices(pg.n, k=1)
    r = np.corrcoef(Kh[iu], K2[iu])[0, 1]
    assert r > 0.85, f"hashed-GRM offdiag corr {r}"


def test_hash_gs_workflow(tmp_path, hash_problem):
    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData
    from janusx_tpu.gs.workflow import GsConfig, run_gs

    pg = hash_problem
    rng = np.random.default_rng(3)
    Z = pg.centered()
    eff = rng.normal(size=pg.m) * 0.2
    gv = Z.T @ eff
    y = gv + rng.normal(size=pg.n) * gv.std() * 0.7
    ym = y.copy()
    ym[-30:] = np.nan
    prefix = str(tmp_path / "hgs")
    plink.write_plink_genotypes(
        prefix, GenotypeData(pg.dosages(), pg.sites, pg.samples)
    )
    with open(prefix + ".pheno", "wt") as fh:
        fh.write("\tt1\n")
        for s, v in zip(pg.samples, ym):
            fh.write(f"{s}\t{'NA' if np.isnan(v) else f'{v:.6f}'}\n")
    out = str(tmp_path / "out" / "g")
    base = dict(genotype=prefix, phenotype=prefix + ".pheno",
                methods=("BLUP",), cv=3, maf=0.0, geno=1.0)
    _, s_plain = run_gs(GsConfig(out_prefix=out + "p", **base))
    _, s_hash = run_gs(GsConfig(out_prefix=out + "h", hash_dim=2048, **base))
    assert s_hash["hash"]["dim"] == 2048
    r_plain = s_plain["traits"]["t1"]["BLUP"]["cv"]["pearson"]
    r_hash = s_hash["traits"]["t1"]["BLUP"]["cv"]["pearson"]
    assert r_hash > r_plain - 0.12, f"hash CV r {r_hash} vs plain {r_plain}"


def test_unstandardized_hash_matches_raw_dosage_reference(hash_problem):
    """standardize=False hashes RAW dosages with missing -> mean_g
    (packed.rs:1016-1022), not centered values."""
    from janusx_tpu.models.hashing import hash_bucket_sign, signed_hash_features

    pg = hash_problem
    H, scale, kept = signed_hash_features(pg, n_buckets=128, standardize=False)
    assert kept == pg.m
    bucket, sign = hash_bucket_sign(520, np.arange(pg.m), 128)
    d = pg.dosages().astype(np.float64)
    raw = np.where(d >= 0, d, pg.mean[:, None])  # missing -> mean_g
    expect = np.zeros((128, pg.n))
    np.add.at(expect, bucket, sign[:, None].astype(np.float64) * raw)
    expect /= np.sqrt(np.mean(np.sum(expect**2, axis=0)))
    np.testing.assert_allclose(H, expect.T, rtol=2e-4, atol=2e-4)
