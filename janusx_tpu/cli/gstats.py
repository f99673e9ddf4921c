"""`jx gstats` — per-site / per-sample genotype statistics
(reference: src/stats/gstats.rs + script/gstats.py)."""

from __future__ import annotations

import argparse

import numpy as np

from janusx_tpu.cli import common


def build_parser(prog="jx gstats") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="Genotype statistics")
    common.add_genotype_args(p)
    o = p.add_argument_group("Options")
    o.add_argument("-site", "--site", action="store_true", help="per-site stats (default)")
    o.add_argument("-ind", "--ind", action="store_true", help="per-sample stats")
    common.add_out_args(p, default_prefix="jx")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "gstats")

    from janusx_tpu.io import bitcodec
    from janusx_tpu.io.gfreader import load_raw_packed

    raw = load_raw_packed(common.resolve_genotype(args))
    n = raw.n_samples
    do_site = args.site or not args.ind
    outputs = []
    if do_site:
        nm, alt, het = bitcodec.row_stats(raw.packed, n)
        with np.errstate(divide="ignore", invalid="ignore"):
            af = np.where(nm > 0, alt / (2.0 * nm), np.nan)
            maf = np.minimum(af, 1 - af)
            het_rate = np.where(nm > 0, het / nm, np.nan)
        miss = 1.0 - nm / n
        path = f"{prefix}.site.stats.tsv"
        with open(path, "wt") as fh:
            fh.write("chrom\tpos\tsnp\tallele0\tallele1\taf\tmaf\tmiss\thet\n")
            s = raw.sites
            for i in range(raw.m):
                fh.write(
                    f"{s.chrom[i]}\t{s.pos[i]}\t{s.snp[i]}\t{s.allele0[i]}\t{s.allele1[i]}"
                    f"\t{af[i]:.6g}\t{maf[i]:.6g}\t{miss[i]:.6g}\t{het_rate[i]:.6g}\n"
                )
        outputs.append(path)
    if args.ind:
        codes = bitcodec.unpack_codes(raw.packed, n)
        missing = (codes == 3).sum(axis=0)
        hets = (codes == 1).sum(axis=0)
        nm = raw.m - missing
        path = f"{prefix}.ind.stats.tsv"
        with open(path, "wt") as fh:
            fh.write("sample\tn_snps\tmiss\thet\n")
            for j, sid in enumerate(raw.samples):
                miss_rate = missing[j] / raw.m if raw.m else 0.0
                het_rate = hets[j] / nm[j] if nm[j] else 0.0
                fh.write(f"{sid}\t{raw.m}\t{miss_rate:.6g}\t{het_rate:.6g}\n")
        outputs.append(path)
    print("\t".join(outputs))
    return 0
