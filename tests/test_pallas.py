"""Pallas fused decode+rotate kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

from janusx_tpu.io import bitcodec


def test_decode_rotate_matches_reference(rng):
    from janusx_tpu.ops.pallas_kernels import rotate_block_pallas

    M, n = 100, 300
    codes = rng.integers(0, 4, size=(M, n)).astype(np.uint8)
    packed = bitcodec.pack_codes(codes)
    mean = rng.uniform(0, 2, M).astype(np.float32)
    U = rng.normal(size=(n, 64)).astype(np.float32)
    # pad K to byte multiple: decode width = 4*ceil(n/4)
    Kb = packed.shape[1]
    K = Kb * 4
    Upad = np.zeros((K, 64), np.float32)
    Upad[:n] = U
    out = np.asarray(
        rotate_block_pallas(packed, mean, Upad, interpret=True)
    )
    # reference: centered decode then matmul
    x = codes.astype(np.float32) - mean[:, None]
    x[codes == 3] = 0.0
    expect = x @ U
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-4)


def test_grid_lattice_kernel_matches_xla():
    """grid_neg_reml_lattice (interpret mode) == the XLA closed form."""
    import jax.numpy as jnp

    from janusx_tpu import config
    from janusx_tpu.core.reml import (
        GridShared,
        argmin_parabolic,
        grid_argmin_schur,
        grid_shared,
        make_rotated,
    )
    from janusx_tpu.core.spectral import eigh_grm
    from janusx_tpu.ops.pallas_kernels import grid_neg_reml_lattice

    rng = np.random.default_rng(4)
    n, m, G, p_cov = 96, 256, 128, 2
    g = rng.binomial(2, 0.3, size=(m, n)).astype(np.float64)
    gc = g - g.mean(axis=1, keepdims=True)
    K = gc.T @ gc / m
    basis = eigh_grm(K, diag_ridge=1e-6)
    cov = rng.normal(size=(n, p_cov - 1))
    y = rng.normal(size=n) + gc[3] * 0.5
    rot = make_rotated(basis, y, cov)
    p = rot.p
    grid_lg = jnp.asarray(np.linspace(-5, 5, G))
    sh = grid_shared(rot, grid_lg)
    Gr = jnp.asarray((gc @ basis.U).astype(np.float64))

    # XLA path: per-SNP grid pieces -> Schur closed form -> lg*
    f32 = jnp.float32
    Gr32 = Gr.astype(f32)
    wT = sh.w32.T
    import jax

    hp = jax.lax.Precision.HIGHEST
    agg = jnp.dot(Gr32 * Gr32, wT, precision=hp)
    agy = jnp.dot(Gr32 * rot.yr.astype(f32)[None, :], wT, precision=hp)
    axg = jnp.stack(
        [jnp.dot(Gr32 * rot.Xr.astype(f32)[None, :, k], wT, precision=hp)
         for k in range(p)], axis=-1)
    lg_xla = np.asarray(grid_argmin_schur(sh, agg, agy, axg, n))

    # Pallas lattice (interpret mode on CPU), padded lanes
    N2 = 128
    B = m
    Wp = jnp.zeros((G, N2), f32).at[:, :n].set(sh.w32)
    YX = jnp.zeros((1 + p, N2), f32)
    YX = YX.at[0, :n].set(rot.yr.astype(f32))
    for q in range(p):
        YX = YX.at[1 + q, :n].set(rot.Xr[:, q].astype(f32))
    SH = jnp.concatenate([
        sh.Ar_inv32.reshape(G, p * p).T,
        sh.Ainv_axy32.T,
        sh.Axx32.reshape(G, p * p).T,
        sh.axy32.T,
        sh.ayy32[None, :],
        sh.logdetAr32[None, :],
        sh.logdetV32[None, :],
    ], axis=0)
    GrF = jnp.zeros((B, N2), f32).at[:, :n].set(Gr32)
    neg = grid_neg_reml_lattice(
        GrF, Wp, YX, SH, p=p, ridge=float(config.GRAM_RIDGE), nf=float(n),
        bm=128, bg=128, interpret=True,
    )
    lg_pl = np.asarray(argmin_parabolic(neg, grid_lg))
    # identical algebra in f32, but dot-reduction order differs between
    # the interpreter and XLA: near-tie argmin cells may flip by one grid
    # spacing (the REML is flat at the optimum) and the parabolic shift
    # moves up to one more — never beyond two spacings
    np.testing.assert_allclose(lg_pl, lg_xla, atol=2.02 * 10.0 / (G - 1))
    assert np.mean(np.abs(lg_pl - lg_xla) < 1e-6) > 0.5
    # what matters downstream: beta/se at each path's λ* agree tightly
    from janusx_tpu.core.reml import final_stats_f32

    b_pl, se_pl, _ = final_stats_f32(rot, Gr32, jnp.asarray(lg_pl), False)
    b_xl, se_xl, _ = final_stats_f32(rot, Gr32, jnp.asarray(lg_xla), False)
    np.testing.assert_allclose(np.asarray(b_pl), np.asarray(b_xl), rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(se_pl), np.asarray(se_xl), rtol=2e-3, atol=1e-6)


def test_decode_rotate_bf16x3_precision(rng):
    """JX_TPU_ROTATE_PREC=high (manual bf16 hi+lo splits, 3 single-pass
    products) must track the full-f32 HIGHEST rotation to ~1e-5 rel."""
    from janusx_tpu.ops.pallas_kernels import (
        decode_rotate_planar, plane_permutation,
    )

    M, n = 256, 512
    codes = rng.integers(0, 4, size=(M, n)).astype(np.uint8)
    packed = bitcodec.pack_codes(codes)
    mean = rng.uniform(0, 2, M).astype(np.float32)
    Kb = packed.shape[1]
    K = Kb * 4
    U = rng.normal(size=(K, 256)).astype(np.float32)
    Up = U[plane_permutation(K, 512)]
    hi = np.asarray(decode_rotate_planar(
        packed, mean[:, None], Up, interpret=True, prec="highest"))
    lo = np.asarray(decode_rotate_planar(
        packed, mean[:, None], Up, interpret=True, prec="high"))
    # matrix-relative: tiny entries of an O(10)-magnitude product carry
    # absolute error from the large terms they sum over
    assert np.max(np.abs(hi - lo)) / np.max(np.abs(hi)) < 1e-5
