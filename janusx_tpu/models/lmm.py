"""Exact per-SNP REML LMM scan (GEMMA-semantics, ``-lmm`` / ``-lmm2``).

The flagship model. Per SNP, λ is optimized by Brent over log10 λ in
(−5, 5) against the profiled REML (reference /root/reference/src/stats/
lmm.rs + reml.rs; tol 1e-2, 50 iters, seeded from the null λ), then
beta/se at the optimum give the Wald test; ``lmm2`` additionally reports
per-SNP λ, the ML loglik at the optimum, and an LRT p against the null ML
(columns lambda/ml/plrt — src/io/assoc2tsv.rs Lmm2_6).

TPU mapping: a whole SNP block optimizes in lockstep — the batched Brent
(janusx_tpu.ops.brent) drives the batched spectral REML objective
(janusx_tpu.core.reml), whose λ-step cost is a few (B, n) x (n, k) MXU
matmuls. This replaces the reference's rayon per-row scalar Brent loops;
warm starts are per-block (null λ) instead of per-row-sequential, which
changes nothing beyond the Brent tolerance.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from janusx_tpu import config
from janusx_tpu.core import stats as jstats
from janusx_tpu.core.reml import (
    NullFit,
    RotatedData,
    beta_se_snp_batch,
    final_grams_f32,
    final_stats_from_grams,
    fit_null_reml,
    grid_shared,
    lmm_grid_scan,
    lmm_grid_scan_with,
    make_rotated,
    ml_snp_batch,
    neg_reml_snp_batch,
)
from janusx_tpu.core.spectral import SpectralBasis
from janusx_tpu.io.packed import PackedGenotypes
from janusx_tpu.models.scan_common import ScanResult, finalize_invalid, iter_blocks, pad_rows
from janusx_tpu.ops import decode
from janusx_tpu.ops.brent import brent_minimize_batched
from janusx_tpu.utils import devcache


@partial(jax.jit, static_argnames=("n", "with_ml", "max_iter"))
def _lmm_block(
    packed, mean, U32, rot: RotatedData, init_lg, n: int, with_ml: bool,
    max_iter: int = config.SCAN_BRENT_MAX_ITER,
):
    """Brent-mode block: lockstep batched Brent (reference-faithful path)."""
    Graw = decode.decode_centered(packed, mean, dtype=jnp.float32)[:, :n]
    Gr = jnp.dot(Graw, U32, precision=jax.lax.Precision.HIGHEST).astype(jnp.float64)
    ssq = jnp.sum(Gr * Gr, axis=-1)
    B = Gr.shape[0]

    f = lambda lg: neg_reml_snp_batch(lg, rot, Gr)
    lgs, _ = brent_minimize_batched(
        f,
        config.LOG10_LAMBDA_LOW,
        config.LOG10_LAMBDA_HIGH,
        config.SCAN_BRENT_TOL,
        max_iter,
        init_x=jnp.full((B,), init_lg, jnp.float64),
    )
    beta, se = beta_se_snp_batch(lgs, rot, Gr)
    ml = ml_snp_batch(lgs, rot, Gr) if with_ml else jnp.zeros_like(lgs)
    return lgs, beta, se, ml, ssq


def _lattice_operands(sh, rot: RotatedData, n: int, N2: int, p: int):
    """Pack the (Wp, YX, SH) operands of the fused λ-lattice kernel.

    The SH row layout MUST stay byte-identical to the offsets hard-coded
    in _grid_lattice_kernel (ops/pallas_kernels.py) — it is defined HERE
    exactly once for both scan paths: the single-trait scan calls this
    directly and the trait-level multi scan vmaps it over the stacked
    trait axis."""
    G = sh.grid_lg.shape[-1]
    f32 = jnp.float32
    Wp = jnp.zeros((G, N2), f32).at[:, :n].set(sh.w32)
    YX = jnp.zeros((1 + p, N2), f32)
    YX = YX.at[0, :n].set(rot.yr.astype(f32))
    for q in range(p):
        YX = YX.at[1 + q, :n].set(rot.Xr[:, q].astype(f32))
    SH = jnp.concatenate(
        [
            sh.Ar_inv32.reshape(G, p * p).T,
            sh.Ainv_axy32.T,
            sh.Axx32.reshape(G, p * p).T,
            sh.axy32.T,
            sh.ayy32[None, :],
            sh.logdetAr32[None, :],
            sh.logdetV32[None, :],
        ],
        axis=0,
    )
    return Wp, YX, SH


def _lmm_scan_core(pk, mn, U32, rot: RotatedData, sh, n: int, with_ml: bool,
                   use_pallas: bool, lattice: bool = True,
                   grid_prec: str = "default", rot_prec: str = "highest"):
    """Whole-scan body on pre-blocked (nblk, B, K) packed genotypes:
    lax.scan streams SNP blocks through decode -> rotate -> grid λ-search
    -> f32-gram beta/se -> device Wald p. Under shard_map the B axis is
    the per-device slice; per-SNP statistics need no communication.
    Returns (6, nblk, B) — the block structure is kept so the sharded
    axis reassembles in SNP order.

    ``sh`` is the precomputed GridShared state (cached across calls — its
    f64 (G, n) lattice work is per-trait, not per-scan).
    """

    p = rot.p
    # fused Pallas λ-lattice: the whole (B, G) Schur/-REML closed form in
    # VMEM (ops.pallas_kernels.grid_neg_reml_lattice) instead of ~15 XLA
    # (B, G) HBM intermediates; needs MXU-aligned B and G tiles
    use_lattice = (
        lattice
        and use_pallas
        and p <= 4
        and sh.grid_lg.shape[0] % 128 == 0
        and pk.shape[1] % 256 == 0
        # VMEM bound: the lattice kernel streams (bm + bg + 1 + p) full
        # sample rows per grid step; past ~32k padded lanes that blows
        # the ~128 MiB VMEM — fall back to the XLA grid instead of a
        # Mosaic allocation error (biobank-n cohorts)
        and U32.shape[1] <= config.knob("JX_TPU_LATTICE_MAX_N")
    )
    if use_lattice:
        from janusx_tpu.ops.pallas_kernels import grid_neg_reml_lattice

        N2 = U32.shape[1]  # plane-permuted operand's padded sample lanes
        Wp, YX, SH = _lattice_operands(sh, rot, n, N2, p)

    if use_lattice:
        # maximally hoisted form: the scan body is ONLY the fused
        # decode+rotate kernel and the VMEM lattice kernel (the measured
        # compute floor); GrF and the (B, G) lattice carry through HBM
        # (the caller bounds resident m so the carry stays ~2 GB) and
        # argmin + final grams + the f64 epilogue each run ONCE over the
        # whole scan — per-op launch overhead inside lax.scan was the
        # dominant non-floor cost (round-3 ablation).
        from janusx_tpu.core.reml import argmin_parabolic

        def body_lat(_, xs):
            pkb, mnb = xs
            from janusx_tpu.ops.pallas_kernels import decode_rotate_planar

            GrF = decode_rotate_planar(pkb, mnb[:, None], U32,
                                       prec=rot_prec)
            neg = grid_neg_reml_lattice(
                GrF, Wp, YX, SH, p=p, ridge=float(config.GRAM_RIDGE),
                nf=float(n), prec=grid_prec,
            )
            return None, (GrF, neg)

        _, (GrF_all, neg_all) = jax.lax.scan(body_lat, None, (pk, mn))
        nblk, B = neg_all.shape[0], neg_all.shape[1]
        Gr_flat = GrF_all.reshape(nblk * B, -1)[:, :n]
        lgs_flat = argmin_parabolic(
            neg_all.reshape(nblk * B, -1), sh.grid_lg)
        ssq = jnp.sum(Gr_flat * Gr_flat, axis=-1).reshape(nblk, B)
        A1, A2, agg, ldV = final_grams_f32(rot, Gr_flat, lgs_flat, with_ml)
        lgs = lgs_flat.reshape(nblk, B)
        beta, se, ml = final_stats_from_grams(
            n, p, A1, A2, agg, with_ml, ldV,
        )
    else:
        def body(_, xs):
            pkb, mnb = xs
            if use_pallas:
                # fused decode+matmul kernel: U32 here is the
                # plane-permuted (K2, N2) operand
                from janusx_tpu.ops.pallas_kernels import decode_rotate_planar

                GrF = decode_rotate_planar(pkb, mnb[:, None], U32,
                                           prec=rot_prec)
                Gr32 = GrF[:, :n]
            else:
                Graw = decode.decode_centered(
                    pkb, mnb, dtype=jnp.float32)[:, :n]
                Gr32 = jnp.dot(Graw, U32,
                               precision=jax.lax.Precision.HIGHEST)
            ssq = jnp.sum(Gr32 * Gr32, axis=-1)  # f32; cast post-scan
            lgs = lmm_grid_scan_with(sh, rot, Gr32)  # casts to f32 inside
            # per-block work stays f32 (MXU grams); the f64 Schur epilogue
            # is launch-bound (emulated f64) and runs ONCE post-scan
            A1, A2, agg, ldV = final_grams_f32(rot, Gr32, lgs, with_ml)
            return None, (lgs, A1, A2, agg, ldV, ssq)

        _, (lgs, A1, A2, agg, ldV, ssq) = jax.lax.scan(body, None, (pk, mn))
        nblk, B = lgs.shape
        beta, se, ml = final_stats_from_grams(
            n, p, A1.reshape(nblk * B, -1), A2.reshape(nblk * B, -1),
            agg.reshape(-1), with_ml, ldV.reshape(-1),
        )
    beta = beta.reshape(nblk, B)
    se = se.reshape(nblk, B)
    # monomorphic/degenerate-lane sanitize ON DEVICE (reference rules,
    # src/math/linalg.rs:99-108 + ssq<=eps): transporting ssq just to
    # re-apply the same mask on host costs relay bytes
    bad = ~jnp.isfinite(beta) | ~jnp.isfinite(se) | (se <= 0) | (ssq <= 1e-12)
    beta = jnp.where(bad, jnp.nan, beta)
    se = jnp.where(bad, jnp.nan, se)
    # Wald χ²(1) p on device: merges the scipy host step into the same
    # dispatch (reference p-value semantics, src/math/linalg.rs:99-108)
    pwald = jstats.pwald_from_beta_se_device(beta, se)
    # one stacked f32 output -> a single host fetch. The dev relay moves
    # ~50 MB/s with ~35 ms latency, so transported bytes are ~45% of the
    # measured scan wall at chromosome m — f32 carries the full precision
    # of every printed column (beta/se %.4f, p %.4e; p-values at the f32
    # floor are recomputed exactly on host via _PWALD_F32_FLOOR). lgs/ml
    # transport ONLY on the lmm2 route (the plain-LMM TSV has no lambda
    # column; ml stays f64 — LRT differences O(n)-magnitude logliks).
    f32 = jnp.float32
    stack = jnp.stack([beta.astype(f32), se.astype(f32), pwald.astype(f32)])
    # shapes kept (nblk, B) for the shard_map out_spec; the caller only
    # FETCHES these on the lmm2 route, so the zeros cost no transport
    ml64 = (ml.reshape(nblk, B) if with_ml
            else jnp.zeros((nblk, B), f32))
    return stack, lgs.astype(f32), ml64


@partial(jax.jit, static_argnames=("n", "with_ml", "use_pallas", "lattice",
                                   "grid_prec", "rot_prec"))
def _lmm_scan_resident(pk, mn, U32, rot, sh, n, with_ml, use_pallas=False,
                       lattice=True, grid_prec="default",
                       rot_prec="highest"):
    return _lmm_scan_core(pk, mn, U32, rot, sh, n, with_ml, use_pallas,
                          lattice, grid_prec, rot_prec)


@lru_cache(maxsize=8)
def _lmm_scan_sharded(mesh, n: int, with_ml: bool, use_pallas: bool,
                      lattice: bool = True, grid_prec: str = "default",
                      rot_prec: str = "highest"):
    """SNP-sharded whole scan: shard_map over the mesh 'snp' axis.

    pk/mn arrive with their per-block SNP axis sharded; U32/rot/sh are
    replicated. Each device scans its SNP rows — the TPU-native
    replacement for the reference's rayon x BLAS two-level thread plan
    (reference python/janusx/assoc/workflow.py:5296-5460)."""
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map

    fn = partial(_lmm_scan_core, n=n, with_ml=with_ml, use_pallas=use_pallas,
                 lattice=lattice, grid_prec=grid_prec, rot_prec=rot_prec)
    mapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(None, "snp", None), P(None, "snp"), P(), P(), P()),
        out_specs=(P(None, None, "snp"), P(None, "snp"), P(None, "snp")),
    )
    return jax.jit(mapped)


def _planar_operand(basis: SpectralBasis, pk_lanes: int, n: int):
    """Plane-permuted (K2, N2) f32 rotation operand for the fused Pallas
    decode+rotate kernel, cached on the basis identity (shared by the
    single- and multi-trait scans)."""
    from janusx_tpu.ops.pallas_kernels import plane_permutation

    bk, bn = 512, 256
    K2 = pk_lanes * 4
    N2 = -(-n // bn) * bn
    key = (id(basis.U), "Uplanar", K2, N2)
    U_op = devcache._cache.get(key)
    if U_op is None:
        U2 = np.zeros((K2, N2), np.float32)
        U2[:n, :n] = basis.U.astype(np.float32)
        U_op = jnp.asarray(U2[plane_permutation(K2, bk)])
        import weakref

        try:
            weakref.finalize(basis.U, devcache._cache.pop, key, None)
            devcache._cache[key] = U_op
        except TypeError:
            pass  # not weakref-able: skip caching
    return U_op


# Per-trait scan state cache: rotated data + λ-grid shared pieces stay
# device-resident across repeated scans of the same (basis, y, cov) —
# multi-model runs, CV folds, FarmCPU iterations, bench re-runs. The
# reference analog is FvLmmAssocCache (src/stats/fvlmm.rs cached rotated
# covariates); here it also avoids remote-link re-uploads.
_state_cache: dict = {}
_STATE_CACHE_MAX = 8


_grid_shared_jit = jax.jit(grid_shared)


def _scan_state(basis: SpectralBasis, y: np.ndarray, covariates, grid_points: int):
    # strong digests, not Python hash(): a 64-bit siphash collision would
    # silently serve one trait's rotated data to another (no error, wrong
    # betas); blake2b makes that impossible in practice and costs ~us
    import hashlib

    key = (
        id(basis.U),
        hashlib.blake2b(y.tobytes(), digest_size=16).digest(),
        None if covariates is None else hashlib.blake2b(
            np.ascontiguousarray(covariates).tobytes(),
            digest_size=16).digest(),
        grid_points,
    )
    hit = _state_cache.get(key)
    if hit is not None:
        return hit
    rot = make_rotated(basis, y, covariates)
    grid_lg = jnp.asarray(
        np.linspace(
            config.LOG10_LAMBDA_LOW, config.LOG10_LAMBDA_HIGH, grid_points
        ),
        jnp.float64,
    )
    sh = _grid_shared_jit(rot, grid_lg)
    if len(_state_cache) >= _STATE_CACHE_MAX:
        _state_cache.pop(next(iter(_state_cache)))
    _state_cache[key] = (rot, grid_lg, sh)
    # id(basis.U) is only unique while basis.U is alive: evict on GC so a
    # recycled address can never serve another basis's rotations
    # (devcache.py's finalizer discipline)
    import weakref

    try:
        weakref.finalize(basis.U, _state_cache.pop, key, None)
    except TypeError:
        _state_cache.pop(key)  # not weakref-able: don't cache at all
        return rot, grid_lg, sh
    return rot, grid_lg, sh


# -log10 p beyond which the device f32 erfc has underflowed: recompute
# those (few) lanes exactly on host.
_PWALD_F32_FLOOR = 1e-30


def lmm_scan(
    pg: PackedGenotypes,
    basis: SpectralBasis,
    y: np.ndarray,
    covariates: np.ndarray | None = None,
    block: int = config.DEFAULT_SNP_BLOCK,
    lmm2: bool = False,
    null: NullFit | None = None,
    method: str = "grid",  # "grid" (TPU-fast) | "brent" (reference-faithful)
    grid_points: int | None = None,  # None = JX_TPU_GRID_POINTS (default 256)
    use_pallas: bool | None = None,  # fused decode+rotate kernel; None = auto (TPU)
    superblock: int = 1 << 20,  # SNPs resident on device per host chunk
    mesh=None,  # jax.sharding.Mesh with a 'snp' axis: SNP-shard the scan
) -> tuple[ScanResult, NullFit]:
    """Exact LMM scan over all SNPs of the (subset) packed genotypes."""
    if method not in ("grid", "brent"):
        # a typo ('Grid', 'GRID', ...) must not silently select the
        # orders-of-magnitude-slower reference-faithful Brent loop
        raise ValueError(
            f"unknown lmm scan method {method!r} (expected 'grid' or 'brent')")
    if method == "brent" and mesh is not None:
        import warnings

        warnings.warn(
            "lmm_scan(method='brent') runs single-device; the mesh argument "
            "is ignored on this path (use method='grid' for sharded scans)",
            stacklevel=2)
    if use_pallas is None:
        use_pallas = (
            method == "grid"
            and jax.default_backend() not in ("cpu",)
            and os.environ.get("JX_TPU_PALLAS", "1") not in ("0", "false")
        )
    # the fused Pallas kernel tiles 512-row SNP planes: a partial tile
    # would be silently skipped (grid floor-division), so any block not
    # aligned to 512 must take the XLA path (small m, tail chunks)
    if use_pallas and min(block, pg.m if pg.m else block) % 512 != 0:
        use_pallas = False
    lattice = os.environ.get("JX_TPU_PALLAS_GRID", "1") not in ("0", "false")
    grid_prec = config.choice_knob("JX_TPU_GRID_MXU_PREC", ("default", "highest"))
    rot_prec = config.choice_knob("JX_TPU_ROTATE_PREC", ("highest", "high"))
    if grid_points is None:
        grid_points = config.knob("JX_TPU_GRID_POINTS")
    y = np.asarray(y, np.float64).reshape(-1)
    n = pg.n
    rot, grid_lg, sh = _scan_state(basis, y, covariates, grid_points)
    if null is None:
        null = fit_null_reml(rot)

    # the full (n, n) f32 rotation upload is only needed by the XLA-grid
    # and brent paths — the Pallas route builds its own planar operand, so
    # uploading here unconditionally would cost n^2*4 dead bytes (1.6 GB
    # at n=20k through a slow link) and pin a second U copy in HBM
    _u32 = lambda: devcache.to_device(basis.U, jnp.float32)
    m = pg.m
    block = min(block, m) if m else block
    # lazy disk-backed inputs (io.windowed.WindowedPacked) bound their
    # resident-SNP chunk; in-RAM inputs chunk only above `superblock`
    superblock = min(superblock, getattr(pg, "max_resident_snps", superblock))
    if use_pallas and method == "grid":
        # the hoisted lattice path carries GrF (m, N2) f32 + the (m, G)
        # lattice through HBM: bound the resident chunk to ~2 GB of carry
        N2 = (-(-n // 256)) * 256
        cap = (2 << 30) // ((N2 + grid_points) * 4)
        superblock = max(min(superblock, (cap // block) * block), block)
    if m > superblock:
        # streaming superblock mode: chunk the (possibly disk-backed)
        # matrix through the resident scan so neither host RAM nor HBM
        # ever holds more than `superblock` materialized SNPs
        # (reference analog: WindowedBedMatrix streaming, src/io/gload.rs).
        # Host IO/decode of chunk k+1 overlaps chunk k's device work
        # (reference double-buffer overlap, src/stats/gblup.rs:27-28).
        from janusx_tpu.utils.prefetch import prefetch_one_ahead

        parts = []
        sb = max((superblock // block) * block, block)
        spans = [(s0, min(s0 + sb, m)) for s0 in range(0, m, sb)]
        for sub in prefetch_one_ahead(
                spans, lambda se: pg.take_snps(np.arange(se[0], se[1]))):
            r, null = lmm_scan(
                sub, basis, y, covariates, block=block, lmm2=lmm2, null=null,
                method=method, grid_points=grid_points, use_pallas=use_pallas,
                mesh=mesh,
            )
            parts.append(r)
        return ScanResult.concat(parts), null
    if not hasattr(pg, "packed"):  # lazy input small enough: materialize
        pg = pg.take_snps(np.arange(m))
    packed = None if method == "grid" else decode.pad_packed_cols(pg.packed)
    if method == "grid":
        if mesh is not None:
            ndev = mesh.devices.size
            # every device needs the same whole blocks: pad block to a
            # multiple of the mesh, and keep the local slice pallas-tileable
            block = -(-block // ndev) * ndev
            if use_pallas and (block // ndev) % 512 != 0:
                use_pallas = False
        m_pad = -(-m // block) * block
        nblk = m_pad // block
        if use_pallas:
            pk = devcache.device_packed_blocks(
                pg, (nblk, block), lane_align=512, mesh=mesh
            )
            U_op = _planar_operand(basis, pk.shape[2], n)
        else:
            pk = devcache.device_packed_blocks(pg, (nblk, block), mesh=mesh)
            U_op = _u32()
        mn = devcache.to_device_blocks(
            pg.mean, (nblk, block), 0.0, dtype=jnp.float32, mesh=mesh
        )
        if mesh is not None:
            U_op, rot_d, sh_d = devcache.replicate_tree((U_op, rot, sh), mesh)
            fn = _lmm_scan_sharded(mesh, n, lmm2, use_pallas, lattice,
                                   grid_prec, rot_prec)
            stack, lgs_dev, ml_dev = fn(pk, mn, U_op, rot_d, sh_d)
        else:
            stack, lgs_dev, ml_dev = _lmm_scan_resident(
                pk, mn, U_op, rot, sh, n, lmm2, use_pallas, lattice,
                grid_prec, rot_prec)
        out = np.asarray(stack).astype(np.float64).reshape(3, m_pad)
        beta = out[0, :m]
        se = out[1, :m]
        pwald_dev = out[2, :m]
        # lambda/ml transport ONLY for the LRT route (fetch bytes are a
        # large share of measured scan wall through the dev relay; the
        # plain-LMM TSV has no lambda column)
        if lmm2:
            lbd = 10.0 ** np.asarray(lgs_dev, np.float64).reshape(m_pad)[:m]
            ml = np.asarray(ml_dev, np.float64).reshape(m_pad)[:m]
        else:
            lbd = np.full(m, np.nan)
            ml = np.zeros(m)
        # degenerate lanes already sanitized on device (ssq mask folded in)
        ssq = np.ones(m)
    else:
        pwald_dev = None
        lbd = np.empty(m)
        beta = np.empty(m)
        se = np.empty(m)
        ml = np.empty(m)
        ssq = np.empty(m)
        U32 = _u32()
        for s0, e0 in iter_blocks(m, block):
            pk = pad_rows(packed[s0:e0], block, 0xFF)
            mn = pad_rows(pg.mean[s0:e0].astype(np.float32), block)
            lgs_b, beta_b, se_b, ml_b, ssq_b = _lmm_block(
                jnp.asarray(pk),
                jnp.asarray(mn),
                U32,
                rot,
                null.log10_lbd,
                n,
                lmm2,
            )
            k = e0 - s0
            lbd[s0:e0] = 10.0 ** np.asarray(lgs_b)[:k]
            beta[s0:e0] = np.asarray(beta_b)[:k]
            se[s0:e0] = np.asarray(se_b)[:k]
            ml[s0:e0] = np.asarray(ml_b)[:k]
            ssq[s0:e0] = np.asarray(ssq_b)[:k]

    if pwald_dev is not None:
        # device f32 erfc is exact to ~1e-7 relative; lanes at/below the
        # f32 underflow floor get the exact host value
        pwald = pwald_dev
        tiny = pwald <= _PWALD_F32_FLOOR
        if tiny.any():
            pwald = pwald.copy()
            pwald[tiny] = jstats.pwald_from_beta_se(beta[tiny], se[tiny])
    else:
        pwald = jstats.pwald_from_beta_se(beta, se)
    if lmm2:
        plrt = jstats.plrt_from_ml(ml, null.ml)
        beta, se, pwald, plrt = finalize_invalid(beta, se, pwald, ssq, plrt)
        res = ScanResult(
            sites=pg.sites, af=pg.af, miss=pg.miss, beta=beta, se=se,
            pwald=pwald, plrt=plrt, lbd=lbd, ml=ml,
            extras={"lambda_null": null.lbd, "ml_null": null.ml},
        )
    else:
        beta, se, pwald, _ = finalize_invalid(beta, se, pwald, ssq)
        res = ScanResult(
            sites=pg.sites, af=pg.af, miss=pg.miss, beta=beta, se=se,
            pwald=pwald, extras={"lambda_null": null.lbd},
        )
    return res, null


# ------------------------------------------------------------ multi-trait


def _lmm_scan_core_multi(pk, mn, U32, rots, shs, n: int, with_ml: bool,
                         use_pallas: bool = False, grid_prec: str = "default",
                         rot_prec: str = "highest"):
    """Multi-trait grid scan: decode + rotate once per SNP block, vmapped
    per-trait λ-grid search + final stats (the trait-level LMM fast path —
    decode+rotate is the scan's throughput floor and is amortized over T).
    rots/shs carry a leading trait axis on every leaf.

    With ``use_pallas`` the block decodes through the fused
    decode_rotate_planar kernel and each trait's λ lattice runs in the
    VMEM-fused grid kernel (an unrolled loop over the static T — the
    same kernels the single-trait scan uses; the earlier XLA-only multi
    path was measured SLOWER per trait than T separate Pallas scans)."""
    p = int(rots.Xr.shape[-1])
    T = int(rots.yr.shape[0])
    if use_pallas:
        from janusx_tpu.core.reml import argmin_parabolic
        from janusx_tpu.ops.pallas_kernels import (
            decode_rotate_planar, grid_neg_reml_lattice,
        )

        N2 = U32.shape[1]
        grid_lg = shs.grid_lg[0]
        # one packer for both scan paths (vmapped over the trait axis) —
        # the SH row layout is defined once in _lattice_operands
        Wp, YX, SH = jax.vmap(
            lambda s_, r_: _lattice_operands(s_, r_, n, N2, p))(shs, rots)

    def body(_, xs):
        pkb, mnb = xs
        if use_pallas:
            GrF = decode_rotate_planar(pkb, mnb[:, None], U32,
                                       prec=rot_prec)
            Gr32 = GrF[:, :n]
        else:
            Graw = decode.decode_centered(pkb, mnb, dtype=jnp.float32)[:, :n]
            Gr32 = jnp.dot(Graw, U32, precision=jax.lax.Precision.HIGHEST)
        ssq = jnp.sum(Gr32 * Gr32, axis=-1)  # f32; cast once post-scan

        if use_pallas:
            outs = []
            for t in range(T):
                neg = grid_neg_reml_lattice(
                    GrF, Wp[t], YX[t], SH[t], p=p,
                    ridge=float(config.GRAM_RIDGE), nf=float(n),
                    prec=grid_prec,
                )
                lgs_t = argmin_parabolic(neg, grid_lg)
                rot_t = jax.tree.map(lambda a: a[t], rots)
                outs.append(
                    (lgs_t,) + final_grams_f32(rot_t, Gr32, lgs_t, with_ml)
                )
            lgs, A1, A2, agg, ldV = (jnp.stack(x) for x in zip(*outs))
        else:
            def per_trait(rot, sh):
                lgs = lmm_grid_scan_with(sh, rot, Gr32)
                return (lgs,) + final_grams_f32(rot, Gr32, lgs, with_ml)

            lgs, A1, A2, agg, ldV = jax.vmap(per_trait)(rots, shs)  # (T, ...)
        return None, (lgs, A1, A2, agg, ldV, ssq)

    _, (lgs, A1, A2, agg, ldV, ssq) = jax.lax.scan(body, None, (pk, mn))
    nblk, T_, B = lgs.shape
    N = nblk * T_ * B
    beta, se, ml = final_stats_from_grams(
        n, p, A1.reshape(N, -1), A2.reshape(N, -1), agg.reshape(-1),
        with_ml, ldV.reshape(-1),
    )
    beta = beta.reshape(nblk, T_, B)
    se = se.reshape(nblk, T_, B)
    bad = (~jnp.isfinite(beta) | ~jnp.isfinite(se) | (se <= 0)
           | (ssq[:, None, :] <= 1e-12))
    beta = jnp.where(bad, jnp.nan, beta)
    se = jnp.where(bad, jnp.nan, se)
    pwald = jstats.pwald_from_beta_se_device(beta, se)
    f32 = jnp.float32
    stack = jnp.stack([beta.astype(f32), se.astype(f32),
                       pwald.astype(f32)])  # (3, nblk, T, B)
    ml64 = (ml.reshape(nblk, T_, B) if with_ml
            else jnp.zeros((nblk, T_, B), f32))
    return stack, lgs.astype(f32), ml64


@partial(jax.jit, static_argnames=("n", "with_ml", "use_pallas", "grid_prec",
                                   "rot_prec"))
def _lmm_scan_resident_multi(pk, mn, U32, rots, shs, n: int, with_ml: bool,
                             use_pallas: bool = False,
                             grid_prec: str = "default",
                             rot_prec: str = "highest"):
    return _lmm_scan_core_multi(pk, mn, U32, rots, shs, n, with_ml,
                                use_pallas, grid_prec, rot_prec)


@lru_cache(maxsize=8)
def _lmm_scan_sharded_multi(mesh, n: int, with_ml: bool,
                            use_pallas: bool = False,
                            grid_prec: str = "default",
                            rot_prec: str = "highest"):
    from jax.sharding import PartitionSpec as P

    fn = partial(_lmm_scan_core_multi, n=n, with_ml=with_ml,
                 use_pallas=use_pallas, grid_prec=grid_prec,
                 rot_prec=rot_prec)
    rot_spec = RotatedData(*([P()] * len(RotatedData._fields)))
    from janusx_tpu.core.reml import GridShared

    sh_spec = GridShared(*([P()] * len(GridShared._fields)))
    return jax.jit(
        jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(None, "snp", None), P(None, "snp"), P(),
                      rot_spec, sh_spec),
            out_specs=(P(None, None, None, "snp"), P(None, None, "snp"),
                       P(None, None, "snp")),
        )
    )


def lmm_scan_multi(
    pg: PackedGenotypes,
    basis: SpectralBasis,
    Y: np.ndarray,
    covariates: np.ndarray | None = None,
    block: int = config.DEFAULT_SNP_BLOCK,
    lmm2: bool = False,
    grid_points: int | None = None,
    mesh=None,
    superblock: int = 1 << 20,
    _prepared=None,
) -> tuple[list[ScanResult], list[NullFit]]:
    """Batched exact-LMM scan for traits sharing one sample mask/basis.

    One resident dispatch covers every trait; numerics match per-trait
    `lmm_scan(method="grid", use_pallas=False)` exactly (same kernels,
    vmapped)."""
    Y = np.asarray(Y, np.float64)
    if Y.ndim == 1:
        Y = Y[:, None]
    n, T = pg.n, Y.shape[1]
    if Y.shape[0] != n:
        raise ValueError(f"Y rows {Y.shape[0]} != samples {n}")
    if grid_points is None:
        grid_points = config.knob("JX_TPU_GRID_POINTS")
    # per-trait rotations/null fits are SNP-independent: computed once and
    # threaded through the superblock chunks via _prepared
    if _prepared is None:
        states = [_scan_state(basis, Y[:, t].copy(), covariates, grid_points)
                  for t in range(T)]
        nulls = [fit_null_reml(rot) for rot, _, _ in states]
    else:
        states, nulls = _prepared
    superblock = min(superblock, getattr(pg, "max_resident_snps", superblock))
    if pg.m > superblock:
        sb = max((superblock // block) * block, block)
        parts = []
        for s0 in range(0, pg.m, sb):
            sub = pg.take_snps(np.arange(s0, min(s0 + sb, pg.m)))
            rs, _ = lmm_scan_multi(sub, basis, Y, covariates, block=block,
                                   lmm2=lmm2, grid_points=grid_points,
                                   mesh=mesh, _prepared=(states, nulls))
            parts.append(rs)
        return ([ScanResult.concat([p[t] for p in parts]) for t in range(T)],
                nulls)
    if not hasattr(pg, "packed"):
        pg = pg.take_snps(np.arange(pg.m))
    rots = jax.tree.map(lambda *xs: jnp.stack(xs), *[s[0] for s in states])
    shs = jax.tree.map(lambda *xs: jnp.stack(xs), *[s[2] for s in states])

    m = pg.m
    block = min(block, m) if m else block
    if mesh is not None:
        block = -(-block // mesh.devices.size) * mesh.devices.size
    # fused Pallas kernels (decode+rotate, λ lattice) per trait — same
    # gating as the single-trait scan; the pure-XLA multi path measured
    # SLOWER per trait than separate Pallas scans (BENCH_NOTES round 3)
    use_pallas = (
        jax.default_backend() not in ("cpu",)
        and os.environ.get("JX_TPU_PALLAS", "1") not in ("0", "false")
        and os.environ.get("JX_TPU_PALLAS_GRID", "1") not in ("0", "false")
        and states[0][0].p <= 4
        and grid_points % 128 == 0
        and block % 512 == 0
        and (mesh is None or (block // mesh.devices.size) % 512 == 0)
        # same VMEM bound as the single-trait lattice gate
        and (-(-pg.n // 256)) * 256 <= config.knob("JX_TPU_LATTICE_MAX_N")
    )
    grid_prec = config.choice_knob("JX_TPU_GRID_MXU_PREC", ("default", "highest"))
    rot_prec = config.choice_knob("JX_TPU_ROTATE_PREC", ("highest", "high"))
    m_pad = -(-m // block) * block
    nblk = m_pad // block
    if use_pallas:
        pk = devcache.device_packed_blocks(
            pg, (nblk, block), lane_align=512, mesh=mesh
        )
        U_op = _planar_operand(basis, pk.shape[2], n)
    else:
        pk = devcache.device_packed_blocks(pg, (nblk, block), mesh=mesh)
        U_op = devcache.to_device(basis.U, jnp.float32)
    mn = devcache.to_device_blocks(
        pg.mean, (nblk, block), 0.0, dtype=jnp.float32, mesh=mesh
    )
    if mesh is not None:
        U_d, rots_d, shs_d = devcache.replicate_tree((U_op, rots, shs), mesh)
        stack, lgs_dev, ml_dev = _lmm_scan_sharded_multi(
            mesh, n, lmm2, use_pallas, grid_prec, rot_prec)(
                pk, mn, U_d, rots_d, shs_d)
    else:
        stack, lgs_dev, ml_dev = _lmm_scan_resident_multi(
            pk, mn, U_op, rots, shs, n, lmm2, use_pallas, grid_prec,
            rot_prec)
    # (3, nblk, T, B) -> (3, T, m_pad); lgs/ml fetch only for lmm2
    out = np.asarray(stack).astype(np.float64).transpose(0, 2, 1, 3)
    out = out.reshape(3, T, m_pad)
    if lmm2:
        lbd_all = 10.0 ** np.asarray(lgs_dev, np.float64).transpose(
            1, 0, 2).reshape(T, m_pad)
        ml_all = np.asarray(ml_dev, np.float64).transpose(
            1, 0, 2).reshape(T, m_pad)
    else:
        lbd_all = np.full((T, m_pad), np.nan)
        ml_all = np.zeros((T, m_pad))
    results = []
    for t in range(T):
        null = nulls[t]
        lbd = lbd_all[t, :m]
        beta, se = out[0, t, :m], out[1, t, :m]
        ssq = np.ones(m)  # degenerate lanes sanitized on device
        ml = ml_all[t, :m]
        pwald = out[2, t, :m]
        tiny = pwald <= _PWALD_F32_FLOOR
        if tiny.any():
            pwald = pwald.copy()
            pwald[tiny] = jstats.pwald_from_beta_se(beta[tiny], se[tiny])
        if lmm2:
            plrt = jstats.plrt_from_ml(ml, null.ml)
            beta_f, se_f, pwald_f, plrt = finalize_invalid(beta, se, pwald, ssq, plrt)
            results.append(ScanResult(
                sites=pg.sites, af=pg.af, miss=pg.miss, beta=beta_f, se=se_f,
                pwald=pwald_f, plrt=plrt, lbd=lbd, ml=ml,
                extras={"lambda_null": null.lbd, "ml_null": null.ml},
            ))
        else:
            beta_f, se_f, pwald_f, _ = finalize_invalid(beta, se, pwald, ssq)
            results.append(ScanResult(
                sites=pg.sites, af=pg.af, miss=pg.miss, beta=beta_f, se=se_f,
                pwald=pwald_f, extras={"lambda_null": null.lbd},
            ))
    return results, nulls
