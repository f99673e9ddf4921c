"""`jx refcheck` — genotype/phenotype consistency report
(reference: script/refcheck.py)."""

from __future__ import annotations

import argparse

import numpy as np

from janusx_tpu.cli import common


def build_parser(prog="jx refcheck") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="Input consistency checks")
    common.add_genotype_args(p)
    p.add_argument("-p", "--pheno", type=str, default=None, help="phenotype file")
    p.add_argument("-g2", "--genotype2", type=str, default=None,
                   help="second genotype input (allele consistency check)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from janusx_tpu.io.gfreader import load_raw_packed

    raw = load_raw_packed(common.resolve_genotype(args))
    print(f"genotype\t{raw.m} SNPs x {raw.n_samples} samples")
    dup = len(raw.samples) - len(set(map(str, raw.samples)))
    if dup:
        print(f"WARNING\t{dup} duplicated sample IDs")
    keys = list(zip(map(str, raw.sites.chrom), raw.sites.pos.tolist()))
    dup_sites = len(keys) - len(set(keys))
    if dup_sites:
        print(f"WARNING\t{dup_sites} duplicated (chrom,pos) sites")

    if args.pheno:
        from janusx_tpu.io.pheno import load_phenotype

        ph = load_phenotype(args.pheno)
        gset = set(map(str, raw.samples))
        pset = set(map(str, ph.samples))
        inter = gset & pset
        print(
            f"phenotype\t{len(ph.samples)} samples, {len(ph.traits)} traits;"
            f" matched={len(inter)} geno-only={len(gset - pset)}"
            f" pheno-only={len(pset - gset)}"
        )
        for t_i, trait in enumerate(ph.traits):
            v = ph.values[:, t_i]
            print(
                f"trait\t{trait}\tn={np.isfinite(v).sum()}"
                f"\tmean={np.nanmean(v):.4g}\tsd={np.nanstd(v):.4g}"
            )
    if args.genotype2:
        raw2 = load_raw_packed(args.genotype2)
        k1 = {(str(c), int(p)): i for i, (c, p) in enumerate(zip(raw.sites.chrom, raw.sites.pos))}
        k2 = {(str(c), int(p)): i for i, (c, p) in enumerate(zip(raw2.sites.chrom, raw2.sites.pos))}
        shared = set(k1) & set(k2)
        same = swapped = mismatch = 0
        for key in shared:
            i, j = k1[key], k2[key]
            a = (str(raw.sites.allele0[i]), str(raw.sites.allele1[i]))
            b = (str(raw2.sites.allele0[j]), str(raw2.sites.allele1[j]))
            if a == b:
                same += 1
            elif a == (b[1], b[0]):
                swapped += 1
            else:
                mismatch += 1
        print(
            f"genotype2\t{raw2.m} SNPs; shared={len(shared)}"
            f" same-allele={same} swapped={swapped} mismatched={mismatch}"
        )
    return 0
