"""`jx gformat` — genotype format conversion + filtering
(reference: python/janusx/script/gformat.py, src/io/gmerge.rs convert)."""

from __future__ import annotations

import argparse


from janusx_tpu.cli import common


def build_parser(prog="jx gformat") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="Convert genotype formats")
    common.add_genotype_args(p)
    o = p.add_argument_group("Output format (select one)")
    o.add_argument("-make-bed", "--make-bed", action="store_true", help="write PLINK")
    o.add_argument("-make-vcf", "--make-vcf", action="store_true", help="write VCF")
    o.add_argument("-make-hmp", "--make-hmp", action="store_true", help="write HapMap")
    o.add_argument("-make-txt", "--make-txt", action="store_true", help="write numeric matrix")
    common.add_qc_args(p)
    f = p.add_argument_group("Filters")
    f.add_argument("--prune", nargs=3, metavar=("WIN", "STEP", "R2"), default=None,
                   help="LD pruning: window(SNPs) step r2-threshold")
    f.add_argument("--biallelic-only", action="store_true", help="keep simple SNPs only")
    common.add_out_args(p, default_prefix="jxout")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "gformat")

    from janusx_tpu.io import plink, writers
    from janusx_tpu.io.gdata import GenotypeData
    from janusx_tpu.io.gfreader import load_raw_packed
    from janusx_tpu.io.packed import QcParams

    raw = load_raw_packed(common.resolve_genotype(args))
    qc = QcParams(
        maf=args.maf, geno=args.geno, het=args.het,
        snps_only=args.biallelic_only,
    )
    pg = raw.prepare(qc)
    if args.prune:
        from janusx_tpu.models.ldprune import ld_prune

        win, step, r2 = int(args.prune[0]), int(args.prune[1]), float(args.prune[2])
        keep = ld_prune(pg, window=win, step=step, r2_threshold=r2)
        pg = pg.take_snps(keep)
    gd = GenotypeData(pg.dosages(), pg.sites, pg.samples)
    outputs = []
    if args.make_bed or not (args.make_vcf or args.make_hmp or args.make_txt):
        plink.write_plink_genotypes(prefix, gd)
        outputs.append(prefix + ".bed")
    if args.make_vcf:
        writers.write_vcf(prefix + ".vcf.gz", gd)
        outputs.append(prefix + ".vcf.gz")
    if args.make_hmp:
        writers.write_hapmap(prefix + ".hmp.txt", gd)
        outputs.append(prefix + ".hmp.txt")
    if args.make_txt:
        writers.write_txt(prefix + ".txt", gd)
        outputs.append(prefix + ".txt")
    print(f"{pg.m} SNPs x {pg.n} samples ->\t" + "\t".join(outputs))
    return 0
