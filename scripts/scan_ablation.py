"""LMM-scan stage ablation + trait-level scaling on the current backend.

Builds the bench.py workload (mouse_hs1940 test0, QC'd SNPs tiled 8x to
m~=72k) and times progressively larger slices of the resident scan body,
fetch-inclusive (block_until_ready does not synchronize through the dev
relay — only host fetches are trustworthy, BENCH_NOTES):

  decode+rotate | +lattice | +argmin | +final-stats | full lmm_scan

plus the `-trait-level` multi-trait fast path at T in {1, 2, 4, 8}
(same mask, vmapped lattice work over traits).

  python scripts/scan_ablation.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from janusx_tpu import config
    from janusx_tpu.core.reml import argmin_parabolic, final_stats_f32
    from janusx_tpu.core.spectral import eigh_grm
    from janusx_tpu.io.gfreader import load_raw_packed
    from janusx_tpu.io.packed import PackedGenotypes, QcParams
    from janusx_tpu.io.pheno import load_phenotype
    from janusx_tpu.models.grm import grm_from_packed
    from janusx_tpu.models import lmm as lmm_mod
    from janusx_tpu.models.scan_common import analysis_sample_index
    from janusx_tpu.utils import devcache

    raw = load_raw_packed("/root/reference/example/mouse_hs1940.vcf.gz")
    ph = load_phenotype("/root/reference/example/mouse_hs1940.pheno")
    y_all, _ = ph.align(raw.samples)
    keep = analysis_sample_index(y_all[:, 0])
    qc = QcParams()
    pg_full = raw.prepare(qc)
    K = grm_from_packed(pg_full)
    pg = raw.prepare(qc, sample_idx=keep)
    basis = eigh_grm(K[np.ix_(keep, keep)], diag_ridge=1e-6)
    big = PackedGenotypes.concat([pg] * 8)
    y = y_all[keep, 0]
    n, m = big.n, big.m
    block = 4608
    m_pad = -(-m // block) * block
    nblk = m_pad // block

    # reproduce lmm_scan's prepared state (grid mode, pallas on)
    grid_points = config.knob("JX_TPU_GRID_POINTS")
    rot, grid_lg, sh = lmm_mod._scan_state(basis, y, None, grid_points)
    use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        from janusx_tpu.ops.pallas_kernels import (
            decode_rotate_planar, grid_neg_reml_lattice, plane_permutation,
        )

        bk, bn = 512, 256
        pk = devcache.device_packed_blocks(big, (nblk, block), lane_align=bk)
        K2 = pk.shape[2] * 4
        N2 = -(-n // bn) * bn
        U2 = np.zeros((K2, N2), np.float32)
        U2[:n, :n] = basis.U.astype(np.float32)
        U_op = jnp.asarray(U2[plane_permutation(K2, bk)])
    else:
        pk = devcache.device_packed_blocks(big, (nblk, block))
        U_op = devcache.to_device(basis.U, jnp.float32)
    mn = devcache.to_device_blocks(
        big.mean, (nblk, block), 0.0, dtype=jnp.float32)

    p = rot.p
    G = sh.grid_lg.shape[0]
    f32 = jnp.float32
    Wp = jnp.zeros((G, N2 if use_pallas else n), f32).at[:, :n].set(sh.w32)
    YX = jnp.zeros((1 + p, N2 if use_pallas else n), f32)
    YX = YX.at[0, :n].set(rot.yr.astype(f32))
    for q in range(p):
        YX = YX.at[1 + q, :n].set(rot.Xr[:, q].astype(f32))
    SH = jnp.concatenate(
        [sh.Ar_inv32.reshape(G, p * p).T, sh.Ainv_axy32.T,
         sh.Axx32.reshape(G, p * p).T, sh.axy32.T, sh.ayy32[None, :],
         sh.logdetAr32[None, :], sh.logdetV32[None, :]], axis=0)

    def rotate_only(pk, mn):
        def body(_, xs):
            pkb, mnb = xs
            GrF = decode_rotate_planar(pkb, mnb[:, None], U_op)
            return None, jnp.sum(GrF[:, :n], axis=-1)

        _, out = jax.lax.scan(body, None, (pk, mn))
        return out

    def plus_lattice(pk, mn):
        def body(_, xs):
            pkb, mnb = xs
            GrF = decode_rotate_planar(pkb, mnb[:, None], U_op)
            neg = grid_neg_reml_lattice(
                GrF, Wp, YX, SH, p=p, ridge=float(config.GRAM_RIDGE),
                nf=float(n), prec="default")
            return None, jnp.sum(neg, axis=-1)

        _, out = jax.lax.scan(body, None, (pk, mn))
        return out

    def plus_argmin(pk, mn):
        def body(_, xs):
            pkb, mnb = xs
            GrF = decode_rotate_planar(pkb, mnb[:, None], U_op)
            neg = grid_neg_reml_lattice(
                GrF, Wp, YX, SH, p=p, ridge=float(config.GRAM_RIDGE),
                nf=float(n), prec="default")
            return None, argmin_parabolic(neg, sh.grid_lg)

        _, out = jax.lax.scan(body, None, (pk, mn))
        return out

    def plus_final(pk, mn):
        def body(_, xs):
            pkb, mnb = xs
            GrF = decode_rotate_planar(pkb, mnb[:, None], U_op)
            neg = grid_neg_reml_lattice(
                GrF, Wp, YX, SH, p=p, ridge=float(config.GRAM_RIDGE),
                nf=float(n), prec="default")
            lgs = argmin_parabolic(neg, sh.grid_lg)
            beta, se, ml = final_stats_f32(rot, GrF[:, :n], lgs, False)
            return None, (lgs, beta, se)

        _, out = jax.lax.scan(body, None, (pk, mn))
        return jnp.stack(out)

    stages = {}
    if use_pallas:
        for name, fn in (("decode_rotate", rotate_only),
                         ("plus_lattice", plus_lattice),
                         ("plus_argmin", plus_argmin),
                         ("plus_final", plus_final)):
            jfn = jax.jit(fn)
            np.asarray(jfn(pk, mn))  # compile
            ts = []
            for _ in range(5):
                t0 = time.monotonic()
                np.asarray(jfn(pk, mn))
                ts.append(time.monotonic() - t0)
            stages[name] = min(ts)
            print(json.dumps({"stage": name, "sec": round(min(ts), 4),
                              "snps_per_sec": round(m / min(ts))}), flush=True)

    # full production scan
    res, null = lmm_mod.lmm_scan(big, basis, y, block=block)
    ts = []
    for _ in range(5):
        t0 = time.monotonic()
        lmm_mod.lmm_scan(big, basis, y, block=block, null=null)
        ts.append(time.monotonic() - t0)
    print(json.dumps({"stage": "full_lmm_scan", "sec": round(min(ts), 4),
                      "snps_per_sec": round(m / min(ts))}), flush=True)

    # trait-level scaling (item 10): T same-mask traits in one dispatch
    rng = np.random.default_rng(0)
    for T in (1, 2, 4, 8):
        Y = np.stack([y + 0.1 * t * rng.normal(size=n) for t in range(T)], 1)
        gp = config.knob("JX_TPU_GRID_POINTS")
        states = [lmm_mod._scan_state(basis, Y[:, t].copy(), None, gp)
                  for t in range(T)]
        nulls = [lmm_mod.fit_null_reml(r) for r, _, _ in states]
        prep = (states, nulls)
        lmm_mod.lmm_scan_multi(big, basis, Y, block=block, _prepared=prep)
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            lmm_mod.lmm_scan_multi(big, basis, Y, block=block, _prepared=prep)
            ts.append(time.monotonic() - t0)
        best = min(ts)
        print(json.dumps({
            "stage": f"trait_level_T{T}", "sec": round(best, 4),
            "per_trait_snps_per_sec": round(m * T / best),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
