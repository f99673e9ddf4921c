"""`jx sim` — simulate genotypes + phenotypes (reference: script/sim.py)."""

from __future__ import annotations

import argparse

from janusx_tpu.cli import common


def build_parser(prog="jx sim") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="Simulate genotypes + phenotypes")
    g = p.add_argument_group("Simulation")
    g.add_argument("-nind", "--nind", type=int, default=1000, help="samples")
    g.add_argument("-nsnp", "--nsnp", type=int, default=10000, help="SNPs")
    g.add_argument("-nchr", "--nchr", type=int, default=5, help="chromosomes")
    g.add_argument("-nqtl", "--nqtl", type=int, default=50, help="causal QTLs")
    g.add_argument("-h2", "--h2", type=float, default=0.5, help="heritability")
    g.add_argument("-ntrait", "--ntrait", type=int, default=1)
    g.add_argument("-miss", "--miss", type=float, default=0.0, help="missing rate")
    g.add_argument("-maf-low", "--maf-low", type=float, default=0.05)
    g.add_argument("-seed", "--seed", type=int, default=0)
    common.add_out_args(p, default_prefix="sim")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "sim")

    from janusx_tpu.io import plink
    from janusx_tpu.models.sim import (
        simulate_genotypes,
        simulate_phenotype,
        write_pheno,
    )

    gd = simulate_genotypes(
        args.nind, args.nsnp, maf_low=args.maf_low, missing_rate=args.miss,
        n_chrom=args.nchr, seed=args.seed,
    )
    sim = simulate_phenotype(
        gd, n_qtl=args.nqtl, h2=args.h2, n_traits=args.ntrait, seed=args.seed
    )
    plink.write_plink_genotypes(prefix, gd)
    write_pheno(prefix + ".pheno", gd.samples, sim.phenotypes)
    with open(prefix + ".qtl.tsv", "wt") as fh:
        fh.write("snp\tchrom\tpos\teffect\n")
        for i, e in zip(sim.qtl_idx, sim.qtl_effects):
            fh.write(
                f"{gd.sites.snp[i]}\t{gd.sites.chrom[i]}\t{gd.sites.pos[i]}\t{e:.6g}\n"
            )
    print(f"{prefix}.bed/.bim/.fam\t{prefix}.pheno\t{prefix}.qtl.tsv")
    return 0
