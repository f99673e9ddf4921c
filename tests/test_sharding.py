"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that SNP-sharded execution produces the same numbers as
single-device execution and that the GRM partial-product psum pattern is
correct — the driver's dryrun_multichip covers compile/execute, these
cover numerics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from janusx_tpu.io import bitcodec
from janusx_tpu.ops import decode
from janusx_tpu.parallel.mesh import make_mesh, pad_to_multiple


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_sharded_grm_matches_single_device(mesh8, rng):
    m, n = 256, 96
    codes = rng.integers(0, 3, size=(m, n)).astype(np.uint8)
    packed = decode.pad_packed_cols(bitcodec.pack_codes(codes))
    mean = codes.mean(axis=1).astype(np.float32)

    def kfn(pk, mn):
        c = decode.decode_centered(pk, mn, dtype=jnp.float32)
        return jnp.dot(c.T, c, precision=jax.lax.Precision.HIGHEST)

    # single device
    K1 = np.asarray(jax.jit(kfn)(packed, mean))
    # SNP-sharded: contraction over the sharded axis -> XLA inserts psum
    shard2 = NamedSharding(mesh8, P("snp", None))
    shard1 = NamedSharding(mesh8, P("snp"))
    pk_s = jax.device_put(packed, shard2)
    mn_s = jax.device_put(mean, shard1)
    K8 = np.asarray(jax.jit(kfn)(pk_s, mn_s))
    np.testing.assert_allclose(K8, K1, rtol=1e-5, atol=1e-5)


def test_sharded_lmm_scan_matches_single_device(mesh8):
    from janusx_tpu.core.reml import (
        beta_se_snp_batch,
        grid_shared,
        lmm_grid_scan_with,
        make_rotated,
    )
    from janusx_tpu.core.spectral import eigh_grm

    rng = np.random.default_rng(2)
    m, n = 64, 80
    G = rng.binomial(2, 0.3, size=(m, n)).astype(np.float64)
    Gc = G - G.mean(axis=1, keepdims=True)
    K = Gc.T @ Gc / m
    basis = eigh_grm(K, diag_ridge=1e-6)
    y = rng.normal(size=n)
    rot = make_rotated(basis, y, None)
    grid = jnp.asarray(np.linspace(-5, 5, 256))
    Gr_host = (Gc @ basis.U).astype(np.float64)

    def scan_fn(Gr):
        sh = grid_shared(rot, grid)
        lgs = lmm_grid_scan_with(sh, rot, Gr)
        beta, se = beta_se_snp_batch(lgs, rot, Gr)
        return lgs, beta, se

    l1, b1, s1 = jax.jit(scan_fn)(jnp.asarray(Gr_host))
    Gr_sharded = jax.device_put(Gr_host, NamedSharding(mesh8, P("snp", None)))
    l8, b8, s8 = jax.jit(scan_fn)(Gr_sharded)
    np.testing.assert_allclose(np.asarray(b8), np.asarray(b1), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(l8), np.asarray(l1), atol=1e-6)


def test_pad_to_multiple():
    x = np.arange(10)
    assert pad_to_multiple(x, 8).shape[0] == 16
    assert pad_to_multiple(x, 5).shape[0] == 10
