"""`jx fastpop` — ancestry decomposition (reference: script/fastpop.py,
python/janusx/fastpop)."""

from __future__ import annotations

import argparse

from janusx_tpu.cli import common


def build_parser(prog="jx fastpop") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="ADMIXTURE-style ancestry inference")
    common.add_genotype_args(p)
    common.add_qc_args(p)
    o = p.add_argument_group("Options")
    o.add_argument("-K", "--npop", type=int, required=True, help="number of ancestral populations")
    o.add_argument("-iter", "--iter", type=int, default=300, help="Adam iterations")
    o.add_argument("-lr", "--lr", type=float, default=0.05)
    o.add_argument("-cv", "--cv", action="store_true", help="also report CV deviance")
    o.add_argument("-seed", "--seed", type=int, default=0)
    o.add_argument("-plot", "--plot", action="store_true", help="write ancestry bar plot")
    common.add_out_args(p, default_prefix="fastpop")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "fastpop")

    from janusx_tpu.io.gfreader import prepare_packed
    from janusx_tpu.io.packed import QcParams
    from janusx_tpu.models.fastpop import (
        cv_error,
        train_admixture,
        write_admixture_outputs,
    )

    pg = prepare_packed(
        common.resolve_genotype(args),
        QcParams(maf=args.maf, geno=args.geno, het=args.het),
    )
    fit = train_admixture(
        pg, args.npop, n_iter=args.iter, lr=args.lr, seed=args.seed
    )
    write_admixture_outputs(prefix, pg.samples, fit)
    if args.plot:
        from janusx_tpu.plots.structure import admixture_bars

        admixture_bars(fit.Q, f"{prefix}.{args.npop}.structure.png")
    line = f"K={args.npop}\tloglik={fit.loglik:.2f}\t{prefix}.{args.npop}.Q"
    if args.cv:
        dev = cv_error(pg, args.npop, seed=args.seed, n_iter=args.iter, lr=args.lr)
        line += f"\tcv_deviance={dev:.5f}"
    print(line)
    return 0
