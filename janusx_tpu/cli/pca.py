"""`jx pca` — principal components (reference: python/janusx/script/pca.py).

Routes: eigh of the GRM (default) or direct randomized SVD on the packed
genotypes (-approx). Writes {prefix}.eigenvec / {prefix}.eigenval."""

from __future__ import annotations

import argparse


from janusx_tpu.cli import common


def build_parser(prog="jx pca") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="Genotype PCA")
    common.add_genotype_args(p)
    common.add_qc_args(p)
    o = p.add_argument_group("Options")
    o.add_argument("-dim", "--dim", type=int, default=10, help="number of PCs")
    o.add_argument("-approx", "--approx", action="store_true",
                   help="randomized SVD route (no dense GRM/eigh)")
    o.add_argument("-gk", "--method", type=int, default=1, choices=(1, 2))
    o.add_argument("-plot", "--plot", action="store_true", help="write a PC1/PC2 scatter plot")
    common.add_out_args(p, default_prefix="jx")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "pca")

    from janusx_tpu.io.gfreader import prepare_packed
    from janusx_tpu.io.packed import QcParams
    from janusx_tpu.models.pca import pca_from_grm, rsvd_pca, write_pca_outputs
    from janusx_tpu.models.grm import grm_from_packed

    pg = prepare_packed(
        common.resolve_genotype(args),
        QcParams(maf=args.maf, geno=args.geno, het=args.het),
    )
    if args.approx:
        vals, vecs = rsvd_pca(pg, n_pc=args.dim, method=args.method)
    else:
        K = grm_from_packed(pg, method=args.method)
        vals, vecs = pca_from_grm(K, n_pc=args.dim)
    write_pca_outputs(prefix, pg.samples, vals, vecs)
    if args.plot and vecs.shape[1] >= 2:
        from janusx_tpu.plots.structure import pc_scatter

        pc_scatter(vecs, prefix + ".pca.png")
    print(f"{prefix}.eigenvec\t{prefix}.eigenval\t(top {len(vals)} PCs)")
    return 0
