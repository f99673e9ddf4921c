"""`jx benchmark` — built-in performance benchmarks on simulated data
(reference: script/benchmark.py, gblupbench.py, bayesbench.py)."""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from janusx_tpu.cli import common


def build_parser(prog="jx benchmark") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="Time core kernels on simulated data")
    p.add_argument("-nind", "--nind", type=int, default=2000)
    p.add_argument("-nsnp", "--nsnp", type=int, default=50_000)
    p.add_argument("-modules", "--modules", type=str,
                   default="grm,lmm,fvlmm,splmm,gblup,bayesa",
                   help="comma-separated: grm,pca,lm,lmm,fvlmm,splmm,gblup,bayesa")
    p.add_argument("-repeats", "--repeats", type=int, default=3)
    p.add_argument("-seed", "--seed", type=int, default=0)
    common.add_out_args(p, default_prefix="bench")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "benchmark")

    from janusx_tpu.core.spectral import eigh_grm
    from janusx_tpu.io.packed import QcParams, pack_genotypes
    from janusx_tpu.models.grm import grm_from_packed
    from janusx_tpu.models.sim import simulate_genotypes, simulate_phenotype

    modules = [m.strip().lower() for m in args.modules.split(",") if m.strip()]
    gd = simulate_genotypes(args.nind, args.nsnp, seed=args.seed)
    sim = simulate_phenotype(gd, n_qtl=100, h2=0.5, seed=args.seed)
    y = sim.phenotypes[:, 0]
    pg = pack_genotypes(gd, QcParams())
    results = []

    def timeit(name, fn, unit_count=None, unit="SNPs"):
        fn()  # warm (compile)
        ts = []
        for _ in range(args.repeats):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        best = min(ts)
        row = {"module": name, "seconds": round(best, 4)}
        if unit_count:
            row["rate"] = round(unit_count / best, 1)
            row["unit"] = f"{unit}/s"
        results.append(row)
        print(f"{name}\t{best:.3f}s" + (f"\t{row.get('rate', ''):,} {unit}/s" if unit_count else ""))

    K = basis = None
    if {"grm", "lmm", "fvlmm", "splmm", "gblup", "pca"} & set(modules):
        timeit("grm", lambda: grm_from_packed(pg), pg.m)
        K = grm_from_packed(pg)
    if {"lmm", "fvlmm"} & set(modules):
        basis = eigh_grm(K, diag_ridge=1e-6)
    if "pca" in modules:
        from janusx_tpu.models.pca import rsvd_pca

        timeit("pca_rsvd", lambda: rsvd_pca(pg, n_pc=10))
    if "lm" in modules:
        from janusx_tpu.models.lm import lm_scan

        timeit("lm_scan", lambda: lm_scan(pg, y), pg.m)
    if "lmm" in modules:
        from janusx_tpu.models.lmm import lmm_scan

        null = lmm_scan(pg, basis, y)[1]
        timeit("lmm_scan", lambda: lmm_scan(pg, basis, y, null=null), pg.m)
    if "fvlmm" in modules:
        from janusx_tpu.models.fvlmm import fvlmm_scan

        timeit("fvlmm_scan", lambda: fvlmm_scan(pg, basis, y), pg.m)
    if "splmm" in modules:
        from janusx_tpu.models.splmm import splmm_grammar_scan

        timeit("splmm_scan", lambda: splmm_grammar_scan(pg, K, y), pg.m)
    if "gblup" in modules:
        from janusx_tpu.gs.blup import fit_gblup

        train = np.arange(int(pg.n * 0.8))
        timeit("gblup_fit", lambda: fit_gblup(K, y, train))
    if "bayesa" in modules:
        from janusx_tpu.gs.bayes import bayes_fit

        var = 2 * pg.af * (1 - pg.af)
        inv = np.where(var > 0, 1 / np.sqrt(var), 0.0)
        Z = (pg.centered() * inv[:, None]).T.astype(np.float32)
        timeit("bayesa_fit_400it", lambda: bayes_fit(Z, y, "BayesA"))

    with open(prefix + ".benchmark.json", "wt") as fh:
        json.dump(
            {"n": pg.n, "m": pg.m, "results": results}, fh, indent=2
        )
    print(prefix + ".benchmark.json")
    return 0
