"""GRM build tests vs direct numpy."""

import numpy as np
import pytest

from janusx_tpu.io.packed import QcParams, pack_genotypes
from janusx_tpu.models.grm import grm_from_packed


def np_grm(g, method):
    """Direct numpy GRM from int8 dosages (-1 missing)."""
    g = g.astype(np.float64)
    miss = g < 0
    obs = ~miss
    p = np.array([row[o].sum() / (2 * o.sum()) for row, o in zip(g, obs)])
    x = np.where(miss, 0.0, g - 2 * p[:, None])
    var = 2 * p * (1 - p)
    if method == 1:
        return x.T @ x / var.sum()
    z = x / np.sqrt(var)[:, None]
    return z.T @ z / len(p)


@pytest.mark.parametrize("method", [1, 2])
def test_grm_matches_numpy(toy_genotypes, method):
    pg = pack_genotypes(toy_genotypes, QcParams(maf=0.05, geno=0.05))
    K = grm_from_packed(pg, method=method, block=64)
    # rebuild expected from the kept/flipped dosages
    d = pg.dosages().astype(np.float64)
    expect = np_grm(d.astype(np.int8), method)
    # decode+matmul run in f32 (f64 accumulate) -> ~1e-7 relative rounding
    np.testing.assert_allclose(K, expect, rtol=5e-5, atol=5e-7)
    assert K.shape == (pg.n, pg.n)


def test_grm_symmetry_psd(toy_genotypes):
    pg = pack_genotypes(toy_genotypes, QcParams())
    K = grm_from_packed(pg, method=1)
    np.testing.assert_allclose(K, K.T, atol=1e-6)
    ev = np.linalg.eigvalsh(K)
    assert ev.min() > -1e-5
