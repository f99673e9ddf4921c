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


def test_grm_part_and_group_strips(tmp_path):
    """-part N [IDX] and -part-group FILE (reference grm.py): strips
    concatenate exactly to the full GRM, work-balanced bounds cover all
    rows, and group strips match the full matrix's rows."""
    import numpy as np

    from janusx_tpu.cli.main import main as jx_main
    from janusx_tpu.io import plink
    from janusx_tpu.models.sim import simulate_genotypes

    gd = simulate_genotypes(75, 250, seed=8)
    prefix = str(tmp_path / "g")
    plink.write_plink_genotypes(prefix, gd)

    rc = jx_main(["grm", "-bfile", prefix, "-maf", "0.0", "-geno", "1.0",
                  "-o", str(tmp_path), "-prefix", "full"])
    assert rc == 0
    K = np.load(str(tmp_path / "full.cGRM.npy"))

    rc = jx_main(["grm", "-bfile", prefix, "-part", "3", "-maf", "0.0",
                  "-geno", "1.0", "-o", str(tmp_path), "-prefix", "pp"])
    assert rc == 0
    strips = [np.load(str(tmp_path / f"pp.cGRM.part{k}_3.npy"))
              for k in (1, 2, 3)]
    np.testing.assert_allclose(np.vstack(strips), K, rtol=2e-3, atol=1e-8)

    # single-part build only writes that part
    rc = jx_main(["grm", "-bfile", prefix, "-part", "4", "2", "-maf", "0.0",
                  "-geno", "1.0", "-o", str(tmp_path), "-prefix", "p1"])
    assert rc == 0
    import glob

    parts = glob.glob(str(tmp_path / "p1.cGRM.part*_4.npy"))
    assert len(parts) == 1 and "part2_4" in parts[0]

    gf = tmp_path / "groups.txt"
    with open(gf, "wt") as fh:
        for i, s in enumerate(gd.samples):
            fh.write(f"{s}\tg{i % 2}\n")
    rc = jx_main(["grm", "-bfile", prefix, "-part-group", str(gf),
                  "-maf", "0.0", "-geno", "1.0",
                  "-o", str(tmp_path), "-prefix", "gg"])
    assert rc == 0
    rows0 = np.arange(75)[::2]
    S0 = np.load(str(tmp_path / "gg.cGRM.group_g0.npy"))
    np.testing.assert_allclose(S0, K[rows0], rtol=2e-3, atol=1e-8)
