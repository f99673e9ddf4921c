"""`jx grm` — GRM build (reference: python/janusx/script/grm.py).

Outputs {out}/{prefix}.cGRM.npy (+ .cGRM.id) for method 1, sGRM for
method 2 (reference cache naming contract, SURVEY §cache)."""

from __future__ import annotations

import argparse

import numpy as np

from janusx_tpu.cli import common


def build_parser(prog="jx grm") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="Genomic relationship matrix")
    common.add_genotype_args(p)
    common.add_qc_args(p)
    o = p.add_argument_group("Options")
    o.add_argument("-gk", "--method", type=int, default=1, choices=(1, 2),
                   help="1 = centered (cGRM), 2 = standardized (sGRM)")
    o.add_argument("-sparse", "--sparse", nargs="?", const=0.05, type=float,
                   default=None, metavar="CUTOFF",
                   help="also write a thresholded sparse GRM (.npz)")
    common.add_out_args(p, default_prefix="jx")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "grm")

    from janusx_tpu.io.gfreader import prepare_packed
    from janusx_tpu.io.packed import QcParams
    from janusx_tpu.models.grm import grm_from_packed

    pg = prepare_packed(
        common.resolve_genotype(args),
        QcParams(maf=args.maf, geno=args.geno, het=args.het),
    )
    K = grm_from_packed(pg, method=args.method)
    tag = "cGRM" if args.method == 1 else "sGRM"
    np.save(f"{prefix}.{tag}.npy", K)
    with open(f"{prefix}.{tag}.id", "wt") as fh:
        for s in pg.samples:
            fh.write(f"{s}\n")
    print(f"{prefix}.{tag}.npy\t({K.shape[0]} x {K.shape[1]}, {pg.m} SNPs)")
    if args.sparse is not None:
        from janusx_tpu.models.splmm import sparsify_grm
        import scipy.sparse

        Ks = sparsify_grm(K, args.sparse)
        scipy.sparse.save_npz(f"{prefix}.{tag}.sparse.npz", Ks)
        print(f"{prefix}.{tag}.sparse.npz\tnnz={Ks.nnz}")
    return 0
