"""Pallas TPU kernels: fused 2-bit decode + matmul.

The genotype matrix never exists in float form in HBM: the packed 2-bit
buffer (16x smaller) is DMA'd to VMEM and decoded to centered f32 tiles
*inside* the matmul kernel, feeding the MXU directly. This removes the
HBM round-trip of the decoded block that the XLA path materializes
(decode producer -> dot operand).

Layout trick (Mosaic cannot shape-cast across lanes): the kernel decodes
the four 2-bit shift planes of a byte tile as four lane-aligned slices
and concatenates them along the lane axis — "plane-major" sample order
within each K tile. The right-hand operand's rows are pre-permuted to
the same per-tile order on the host, so the contraction is unchanged:
within K-tile k, plane-major position s*(bk/4)+b corresponds to original
sample 4b+s.

Kernel: rotate — R[M, N] = decode(packed[M, K/4]) @ U[K, N]
(the GWAS scan's first stage; the GRM accumulation C^T C reuses the same
decode-tile helper).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_tile_planar(pk, mean_col):
    """(bm, bk//4) uint8 packed -> (bm, bk) centered f32, plane-major.

    Output columns [s*(bk//4) + b] hold sample 4b+s of the tile. Dosage
    codes 0/1/2; 3 = missing -> exactly 0 after centering.
    """
    planes = []
    pki = pk.astype(jnp.int32)
    three = jnp.asarray(3, jnp.int32)
    for s in range(4):
        codes = jax.lax.shift_right_logical(
            pki, jnp.asarray(2 * s, jnp.int32)
        ) & three
        x = codes.astype(jnp.float32) - mean_col
        planes.append(jnp.where(codes == three, jnp.float32(0.0), x))
    return jnp.concatenate(planes, axis=1)


def plane_permutation(K: int, bk: int) -> np.ndarray:
    """perm such that U_planar[t] = U[perm[t]] matches the kernel order."""
    assert K % bk == 0 and bk % 4 == 0
    perm = np.empty(K, np.int64)
    nb = bk // 4
    for k0 in range(0, K, bk):
        t = 0
        for s in range(4):
            for b in range(nb):
                perm[k0 + t] = k0 + 4 * b + s
                t += 1
    return perm


def _rotate_kernel(prec, pk_ref, mean_ref, u_ref, out_ref, acc_ref):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = _decode_tile_planar(pk_ref[:], mean_ref[:])  # (bm, bk)
    if prec == "highest":
        # full-f32 MXU passes (default) — the rotation feeds f64
        # likelihoods and matches the reference's f32 sgemm accuracy
        acc_ref[:] += jnp.dot(
            a, u_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        # JX_TPU_ROTATE_PREC=high: manual bf16x3 (Mosaic has no
        # Precision.HIGH) — split both operands into bf16 hi+lo parts;
        # three single-pass products reconstruct ~f32 accuracy (~1e-6
        # rel) at half the HIGHEST pass count
        u = u_ref[:]
        bf16, f32 = jnp.bfloat16, jnp.float32
        a_hi = a.astype(bf16)
        a_lo = (a - a_hi.astype(f32)).astype(bf16)
        u_hi = u.astype(bf16)
        u_lo = (u - u_hi.astype(f32)).astype(bf16)
        kw = dict(preferred_element_type=f32,
                  precision=jax.lax.Precision.DEFAULT)
        acc_ref[:] += (jnp.dot(a_hi, u_hi, **kw)
                       + jnp.dot(a_hi, u_lo, **kw)
                       + jnp.dot(a_lo, u_hi, **kw))

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=("bm", "bk", "bn", "interpret", "prec"))
def decode_rotate_planar(
    packed: jax.Array,  # (M, K/4) uint8
    mean: jax.Array,  # (M, 1) f32
    U_planar: jax.Array,  # (K, N) f32, rows pre-permuted via plane_permutation
    bm: int = 256,
    bk: int = 512,
    bn: int = 256,
    interpret: bool = False,
    prec: str = "highest",  # callers thread JX_TPU_ROTATE_PREC (read
    # OUTSIDE jit so the knob participates in the compile key)
):
    if prec not in ("highest", "high"):
        # reject unknown values here rather than silently dropping onto
        # the reduced-precision bf16x3 branch (the else below)
        raise ValueError(
            f"JX_TPU_ROTATE_PREC={prec!r}: expected 'highest' (full f32, "
            "default) or 'high' (bf16x3)")
    M, Kb = packed.shape
    K, N = U_planar.shape
    assert K == Kb * 4
    if M % bm or N % bn or K % bk:
        # a partial tile would be SILENTLY SKIPPED by the floor-divided
        # grid (uninitialized output rows) — refuse misaligned shapes;
        # internal scan call sites pad/gate alignment before calling
        raise ValueError(
            f"decode_rotate_planar needs M%{bm}==0, N%{bn}==0, K%{bk}==0; "
            f"got M={M}, N={N}, K={K} — pad the inputs")
    grid = (M // bm, N // bn, K // bk)
    return pl.pallas_call(
        partial(_rotate_kernel, prec),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (bm, bk // 4), lambda i, j, k: (i, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                # the literal 0 must stay i32 under jax_enable_x64
                (bm, 1),
                lambda i, j, k: (i, jnp.asarray(0, jnp.int32)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(packed, mean, U_planar)


def _grid_lattice_kernel(p: int, ridge: float, nf: float, prec: str,
                         gr_ref, w_ref, yx_ref, sh_ref, out_ref):
    """One (bB, bG) tile of the per-(SNP, λ) profiled -REML lattice.

    gr_ref: (bB, Npad) rotated SNP rows (f32, zero-padded lanes);
    w_ref:  (bG, Npad) grid weights 1/(s+λ) (zero-padded lanes);
    yx_ref: (1+p, Npad) rows = [yr, Xr_0..Xr_{p-1}];
    sh_ref: (2p²+2p+3, bG) shared per-λ pieces
            [Ar_inv (p²), Ainv_axy (p), Axx (p²), axy (p), ayy,
             logdetAr, logdetV];
    out_ref: (bB, bG) -REML (inf on invalid cells).

    The XLA formulation materializes ~15 (B, G) intermediates in HBM;
    here the three per-SNP grid grams are MXU contractions against the
    resident weight tile and the whole Schur closed form stays in VMEM.
    """
    # the lattice only RANKS grid cells (beta/se are re-evaluated exactly
    # at λ*), so prec="default" (one-pass MXU: bf16 inputs, f32
    # accumulate) is safe and measured +12% whole-scan vs "highest"
    # (max -log10 p shift 0.016 on mouse, inside the 0.05 grid-vs-brent
    # envelope); JX_TPU_GRID_MXU_PREC=highest restores six-pass f32
    gprec = (jax.lax.Precision.HIGHEST if prec == "highest"
             else jax.lax.Precision.DEFAULT)
    gr = gr_ref[:]
    w = w_ref[:]
    dims = (((1,), (1,)), ((), ()))

    def gram(rows):  # (bB, Npad) x (bG, Npad) -> (bB, bG)
        return jax.lax.dot_general(
            rows, w, dimension_numbers=dims,
            preferred_element_type=jnp.float32, precision=gprec,
        )

    agg = gram(gr * gr)
    agy = gram(gr * yx_ref[0:1, :])
    axg = [gram(gr * yx_ref[1 + q:2 + q, :]) for q in range(p)]

    sh = sh_ref[:]
    o_arinv, o_ainvaxy, o_axx, o_axy = 0, p * p, p * p + p, 2 * p * p + p
    o_ayy = 2 * p * p + 2 * p
    Ar_inv = [[sh[o_arinv + a * p + b:o_arinv + a * p + b + 1, :]
               for b in range(p)] for a in range(p)]
    Ainv_axy = [sh[o_ainvaxy + a:o_ainvaxy + a + 1, :] for a in range(p)]
    Axx = [[sh[o_axx + a * p + b:o_axx + a * p + b + 1, :]
            for b in range(p)] for a in range(p)]
    axy = [sh[o_axy + a:o_axy + a + 1, :] for a in range(p)]
    ayy = sh[o_ayy:o_ayy + 1, :]
    logdetAr = sh[o_ayy + 1:o_ayy + 2, :]
    logdetV = sh[o_ayy + 2:o_ayy + 3, :]

    # u_a = sum_b Ar_inv[a][b] * axg_b   (rows broadcast over bB)
    u = [sum(Ar_inv[a][b] * axg[b] for b in range(p)) for a in range(p)]
    schur = (agg + jnp.float32(ridge)) - sum(
        axg[a] * u[a] for a in range(p)
    )
    beta_g = (agy - sum(axg[a] * Ainv_axy[a] for a in range(p))) / schur
    beta_X = [Ainv_axy[a] - beta_g * u[a] for a in range(p)]
    lin = sum(beta_X[a] * axy[a] for a in range(p)) + beta_g * agy
    quad = (
        sum(beta_X[a] * Axx[a][b] * beta_X[b]
            for a in range(p) for b in range(p))
        + 2.0 * beta_g * sum(axg[a] * beta_X[a] for a in range(p))
        + beta_g * beta_g * agg
    )
    rtwr = ayy - 2.0 * lin + quad
    neg = 0.5 * (
        jnp.float32(nf - (p + 1)) * jnp.log(rtwr)
        + logdetV
        + logdetAr + jnp.log(schur)
    )
    bad = ~jnp.isfinite(neg) | (rtwr <= 0) | (schur <= 0)
    out_ref[:] = jnp.where(bad, jnp.float32(jnp.inf), neg)


@partial(jax.jit, static_argnames=("p", "ridge", "nf", "prec", "bm", "bg",
                                   "interpret"))
def grid_neg_reml_lattice(
    Gr: jax.Array,  # (B, Npad) f32, lanes >= n zero
    W: jax.Array,  # (G, Npad) f32 grid weights, padded lanes zero
    YX: jax.Array,  # (1+p, Npad) f32 [yr, Xr columns], padded lanes zero
    SH: jax.Array,  # (2p^2+2p+3, G) f32 shared per-λ pieces
    p: int,
    ridge: float,
    nf: float,
    prec: str = "default",
    bm: int = 256,
    bg: int = 128,
    interpret: bool = False,
):
    """Fused (B, G) -REML lattice (see _grid_lattice_kernel)."""
    B, Npad = Gr.shape
    G = W.shape[0]
    R = SH.shape[0]
    if B % bm or G % bg:
        # floor-divided grid would silently skip the partial tile
        raise ValueError(
            f"grid_neg_reml_lattice needs B%{bm}==0 and G%{bg}==0; "
            f"got B={B}, G={G} — pad the inputs")
    grid = (B // bm, G // bg)
    kern = partial(_grid_lattice_kernel, p, ridge, nf, prec)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            # literal block offsets must stay i32 under jax_enable_x64
            pl.BlockSpec((bm, Npad),
                         lambda i, j: (i, jnp.asarray(0, jnp.int32)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, Npad),
                         lambda i, j: (j, jnp.asarray(0, jnp.int32)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((YX.shape[0], Npad),
                         lambda i, j: (jnp.asarray(0, jnp.int32),
                                       jnp.asarray(0, jnp.int32)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, bg),
                         lambda i, j: (jnp.asarray(0, jnp.int32), j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bg), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G), jnp.float32),
        interpret=interpret,
    )(Gr, W, YX, SH)


def rotate_block_pallas(packed_block, mean_block, U, interpret: bool = False):
    """Fused decode+rotate for arbitrary shapes (host-side padding + U row
    permutation). U must have 4*packed_block.shape[1] rows (zero rows for
    lanes beyond the true sample count)."""
    M, Kb = packed_block.shape
    K, N = U.shape
    assert K == Kb * 4, (K, Kb)
    bm, bk, bn = 256, 512, 256
    M2 = -(-M // bm) * bm
    K2 = -(-K // bk) * bk
    N2 = -(-N // bn) * bn
    pk = np.full((M2, K2 // 4), 0xFF, np.uint8)
    pk[:M, :Kb] = np.asarray(packed_block)
    mn = np.zeros((M2, 1), np.float32)
    mn[:M, 0] = np.asarray(mean_block).reshape(-1)
    U2 = np.zeros((K2, N2), np.float32)
    U2[:K, :N] = np.asarray(U)
    perm = plane_permutation(K2, bk)
    out = decode_rotate_planar(
        jnp.asarray(pk), jnp.asarray(mn), jnp.asarray(U2[perm]),
        bm=bm, bk=bk, bn=bn, interpret=interpret,
    )
    return out[:M, :N]
