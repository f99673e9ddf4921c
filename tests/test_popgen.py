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
