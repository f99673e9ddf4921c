"""`jx gmerge` — merge genotype panels
(reference: src/io/gmerge.rs merge_genotypes: multi-panel merge with
ref-allele harmonization)."""

from __future__ import annotations

import argparse

import numpy as np

from janusx_tpu.cli import common


def build_parser(prog="jx gmerge") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="Merge genotype panels by shared sites")
    p.add_argument("-i", "--inputs", type=str, nargs="+", required=True,
                   help="two or more genotype inputs (any supported format)")
    common.add_out_args(p, default_prefix="merged")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "gmerge")
    if len(args.inputs) < 2:
        raise SystemExit("need at least two inputs")

    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData
    from janusx_tpu.io.gfreader import load_genotype_file

    panels = [load_genotype_file(p) for p in args.inputs]
    # site key: (chrom, pos); harmonize to the first panel's alleles
    def keys(gd):
        return {
            (str(c), int(p)): i
            for i, (c, p) in enumerate(zip(gd.sites.chrom, gd.sites.pos))
        }

    base = panels[0]
    common_keys = set(keys(base))
    for gd in panels[1:]:
        common_keys &= set(keys(gd))
    if not common_keys:
        raise SystemExit("no shared sites across panels")
    order = sorted(common_keys)
    base_idx = keys(base)
    sel0 = np.array([base_idx[k] for k in order])
    sites = base.sites.take(sel0)
    blocks = [base.genotypes[sel0]]
    samples = [base.samples]
    dropped_strand = 0
    for gd in panels[1:]:
        idx = keys(gd)
        sel = np.array([idx[k] for k in order])
        g = gd.genotypes[sel].copy()
        a0 = gd.sites.allele0[sel]
        a1 = gd.sites.allele1[sel]
        same = (a0 == sites.allele0) & (a1 == sites.allele1)
        swapped = (a0 == sites.allele1) & (a1 == sites.allele0)
        sw = np.nonzero(swapped)[0]
        sub = g[sw]
        sub[sub >= 0] = 2 - sub[sub >= 0]
        g[sw] = sub
        bad = ~(same | swapped)
        g[bad] = -1  # allele mismatch -> missing
        dropped_strand += int(bad.sum())
        blocks.append(g)
        samples.append(gd.samples)
    merged = GenotypeData(
        np.concatenate(blocks, axis=1),
        sites,
        np.concatenate(samples),
    )
    plink.write_plink_genotypes(prefix, merged)
    print(
        f"{prefix}.bed\t{merged.m} shared SNPs x {merged.n} samples"
        f"\t(mismatched-allele rows set missing: {dropped_strand})"
    )
    return 0
