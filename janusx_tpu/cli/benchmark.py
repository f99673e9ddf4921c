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


def _bench_problem(nind, nsnp, h2, seed, test_frac=0.2):
    from janusx_tpu.io.packed import QcParams, pack_genotypes
    from janusx_tpu.models.sim import simulate_genotypes, simulate_phenotype

    gd = simulate_genotypes(nind, nsnp, seed=seed)
    sim = simulate_phenotype(gd, n_qtl=max(20, nsnp // 100), h2=h2, seed=seed)
    y = sim.phenotypes[:, 0]
    pg = pack_genotypes(gd, QcParams())
    n_test = int(nind * test_frac)
    return pg, y, np.arange(nind - n_test), np.arange(nind - n_test, nind), sim


def gblupbench_main(argv=None) -> int:
    """`jx gblupbench` — GBLUP/rrBLUP route benchmark: CV timing + holdout
    accuracy per route (reference: script/gblupbench.py)."""
    p = argparse.ArgumentParser(prog="jx gblupbench")
    p.add_argument("-nind", "--nind", type=int, default=2000)
    p.add_argument("-nsnp", "--nsnp", type=int, default=20_000)
    p.add_argument("-h2", "--h2", type=float, default=0.5)
    p.add_argument("-cv", "--cv", type=int, default=5)
    p.add_argument("-seed", "--seed", type=int, default=0)
    common.add_out_args(p, default_prefix="gblupbench")
    args = p.parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "gblupbench")

    from janusx_tpu.gs.blup import fit_gblup, fit_gblup_cg, predict_gblup
    from janusx_tpu.gs.kfold import KFold
    from janusx_tpu.gs.metrics import regression_metrics
    from janusx_tpu.models.grm import grm_from_packed

    pg, y, train, test, _ = _bench_problem(args.nind, args.nsnp, args.h2,
                                           args.seed)
    t0 = time.monotonic()
    K = grm_from_packed(pg)
    t_grm = time.monotonic() - t0
    rows = []
    print(f"n={pg.n} m={pg.m} grm={t_grm:.2f}s")
    print("route\tcv_s\tfit_s\tcv_r\ttest_r")
    for route in ("GBLUP", "rrBLUP-PCG"):
        kf = KFold(args.cv, shuffle=True, random_state=args.seed)
        t0 = time.monotonic()
        rs = []
        for tr, va in kf.split(len(train)):
            if route == "GBLUP":
                mdl = fit_gblup(K, y, train[tr])
                pv = predict_gblup(mdl, K, train[va])
            else:
                mdl0 = fit_gblup(K, y, train[tr])
                alpha, beta0 = fit_gblup_cg(K, y, train[tr], mdl0.lbd)
                pv = K[np.ix_(train[va], train[tr])] @ alpha + beta0[0]
            rs.append(regression_metrics(y[train[va]], pv)["pearson"])
        cv_s = time.monotonic() - t0
        t0 = time.monotonic()
        if route == "GBLUP":
            mdl = fit_gblup(K, y, train)
            pv = predict_gblup(mdl, K, test)
        else:
            mdl0 = fit_gblup(K, y, train)
            alpha, beta0 = fit_gblup_cg(K, y, train, mdl0.lbd)
            pv = K[np.ix_(test, train)] @ alpha + beta0[0]
        fit_s = time.monotonic() - t0
        test_r = regression_metrics(y[test], pv)["pearson"]
        rows.append({"route": route, "cv_seconds": round(cv_s, 3),
                     "fit_seconds": round(fit_s, 3),
                     "cv_pearson": round(float(np.mean(rs)), 4),
                     "test_pearson": round(float(test_r), 4)})
        print(f"{route}\t{cv_s:.2f}\t{fit_s:.2f}\t{np.mean(rs):.3f}\t{test_r:.3f}")
    with open(prefix + ".gblupbench.json", "wt") as fh:
        json.dump({"n": pg.n, "m": pg.m, "grm_seconds": round(t_grm, 3),
                   "routes": rows}, fh, indent=2)
    print(prefix + ".gblupbench.json")
    return 0


def bayesbench_main(argv=None) -> int:
    """`jx bayesbench` — Bayes A/B/Cpi vs BLUP: chain timing + holdout
    accuracy (reference: script/bayesbench.py compare)."""
    p = argparse.ArgumentParser(prog="jx bayesbench")
    p.add_argument("-nind", "--nind", type=int, default=1500)
    p.add_argument("-nsnp", "--nsnp", type=int, default=10_000)
    p.add_argument("-h2", "--h2", type=float, default=0.5)
    p.add_argument("-iters", "--iters", type=int, default=2000)
    p.add_argument("-burnin", "--burnin", type=int, default=500)
    p.add_argument("-thin", "--thin", type=int, default=5)
    p.add_argument("-seed", "--seed", type=int, default=0)
    common.add_out_args(p, default_prefix="bayesbench")
    args = p.parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "bayesbench")

    from janusx_tpu.gs.bayes import bayes_fit
    from janusx_tpu.gs.blup import fit_gblup, predict_gblup
    from janusx_tpu.gs.metrics import regression_metrics
    from janusx_tpu.models.grm import grm_from_packed

    pg, y, train, test, _ = _bench_problem(args.nind, args.nsnp, args.h2,
                                           args.seed)
    var = 2 * pg.af * (1 - pg.af)
    inv = np.where(var > 0, 1 / np.sqrt(var), 0.0)
    Z = (pg.centered() * inv[:, None]).T.astype(np.float32)
    rows = []
    print(f"n={pg.n} m={pg.m} iters={args.iters}(burn {args.burnin})")
    print("method\tfit_s\ttest_r")
    K = grm_from_packed(pg)
    t0 = time.monotonic()
    mdl = fit_gblup(K, y, train)
    pv = predict_gblup(mdl, K, test)
    sec = time.monotonic() - t0
    r = regression_metrics(y[test], pv)["pearson"]
    rows.append({"method": "BLUP", "fit_seconds": round(sec, 3),
                 "test_pearson": round(float(r), 4)})
    print(f"BLUP\t{sec:.2f}\t{r:.3f}")
    for method in ("BayesA", "BayesB", "BayesCpi"):
        t0 = time.monotonic()
        beta, mu = bayes_fit(Z[train], y[train], method, args.iters,
                             args.burnin, args.thin, args.seed)
        sec = time.monotonic() - t0
        pv = mu + Z[test] @ beta
        r = regression_metrics(y[test], pv)["pearson"]
        rows.append({"method": method, "fit_seconds": round(sec, 3),
                     "test_pearson": round(float(r), 4)})
        print(f"{method}\t{sec:.2f}\t{r:.3f}")
    with open(prefix + ".bayesbench.json", "wt") as fh:
        json.dump({"n": pg.n, "m": pg.m, "iters": args.iters,
                   "methods": rows}, fh, indent=2)
    print(prefix + ".bayesbench.json")
    return 0


def garfieldbench_main(argv=None) -> int:
    """`jx garfieldbench` — planted-epistasis recovery power + search
    timing across depths (reference: script/garfieldbench.py)."""
    p = argparse.ArgumentParser(prog="jx garfieldbench")
    p.add_argument("-nind", "--nind", type=int, default=500)
    p.add_argument("-nsnp", "--nsnp", type=int, default=2000)
    p.add_argument("-pve", "--pve", type=float, default=0.4)
    p.add_argument("-reps", "--reps", type=int, default=5)
    p.add_argument("-beam", "--beam", type=int, default=64)
    p.add_argument("-seed", "--seed", type=int, default=0)
    common.add_out_args(p, default_prefix="garfieldbench")
    args = p.parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "garfieldbench")

    from janusx_tpu.io.packed import QcParams, pack_genotypes
    from janusx_tpu.models.garfield import garfield_scan
    from janusx_tpu.models.sim import simulate_genotypes, simulate_phenotype

    rows = []
    print("rep\tgate\trecovered\tseconds")
    hits = 0
    for rep in range(args.reps):
        gd = simulate_genotypes(args.nind, args.nsnp, maf_low=0.2,
                                seed=args.seed + rep)
        sim = simulate_phenotype(
            gd, n_qtl=0, h2=args.pve, epistasis_pairs=1,
            epistasis_pve=args.pve, epistasis_gate="A", seed=args.seed + rep,
        )
        i, j, gate, _ = sim.epi_pairs[0]
        pg = pack_genotypes(gd, QcParams(maf=0.0, geno=1.0))
        t0 = time.monotonic()
        res = garfield_scan(pg, sim.phenotypes[:, 0], depth=2,
                            beam=args.beam, n_perm=20, seed=rep)
        sec = time.monotonic() - t0
        got = set(res.rules[0].snps) == {i, j} if res.rules else False
        hits += int(got)
        rows.append({"rep": rep, "gate": gate, "recovered": bool(got),
                     "seconds": round(sec, 3)})
        print(f"{rep}\t{gate}\t{got}\t{sec:.2f}")
    print(f"power: {hits}/{args.reps}")
    with open(prefix + ".garfieldbench.json", "wt") as fh:
        json.dump({"n": args.nind, "m": args.nsnp, "pve": args.pve,
                   "power": hits / args.reps, "reps": rows}, fh, indent=2)
    print(prefix + ".garfieldbench.json")
    return 0
