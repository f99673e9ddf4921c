"""`jx tree` — NJ phylogeny from genotypes (reference: script/tree.py)."""

from __future__ import annotations

import argparse

from janusx_tpu.cli import common


def build_parser(prog="jx tree") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="Neighbor-joining tree")
    common.add_genotype_args(p)
    common.add_qc_args(p)
    o = p.add_argument_group("Options")
    o.add_argument("-dist", "--write-dist", action="store_true",
                   help="also write the IBS distance matrix")
    o.add_argument("-ml", "--ml", action="store_true",
                   help="refine the NJ tree by approximate maximum "
                   "likelihood (CFN model, NNI search — reference "
                   "`jx tree -ml` / FastTree)")
    o.add_argument("-ml-sites", "--ml-sites", type=int, default=2000,
                   help="site budget for the ML refinement")
    o.add_argument("-seed", "--seed", type=int, default=0)
    common.add_out_args(p, default_prefix="jxtree")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "tree")

    import numpy as np

    from janusx_tpu.io.gfreader import prepare_packed
    from janusx_tpu.io.packed import QcParams
    from janusx_tpu.models.tree import ibs_distance, neighbor_joining

    pg = prepare_packed(
        common.resolve_genotype(args),
        QcParams(maf=args.maf, geno=args.geno, het=args.het),
    )
    D = ibs_distance(pg)
    newick = neighbor_joining(D, pg.samples)
    with open(prefix + ".nwk", "wt") as fh:
        fh.write(newick + "\n")
    if args.ml:
        from janusx_tpu.models.mltree import (
            genotype_leaf_partials,
            ml_refine_tree,
            to_newick,
        )

        parts = genotype_leaf_partials(
            pg.dosages(), site_budget=args.ml_sites, seed=args.seed
        )
        t = ml_refine_tree(newick, parts, [str(s) for s in pg.samples], k=2)
        with open(prefix + ".ml.nwk", "wt") as fh:
            fh.write(to_newick(t) + "\n")
        print(f"{prefix}.ml.nwk\tlogL={t.loglik:.2f}")
    if args.write_dist:
        np.savetxt(prefix + ".ibs.dist", D, fmt="%.6g", delimiter="\t")
        with open(prefix + ".ibs.id", "wt") as fh:
            for s in pg.samples:
                fh.write(f"{s}\n")
    print(f"{prefix}.nwk\t({pg.n} samples, {pg.m} SNPs)")
    return 0
