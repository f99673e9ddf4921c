"""`jx bsa` — bulked-segregant analysis (reference: src/stats/bsa.rs +
script/postbsa.py).

Input: a TSV with columns chrom, pos, and ALT/REF depths of the two bulks
(alt1 ref1 alt2 ref2 — column names configurable)."""

from __future__ import annotations

import argparse

from janusx_tpu.cli import common


def build_parser(prog="jx bsa") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="BSA Δ-SNP index / G' scan")
    p.add_argument("-i", "--input", type=str, required=True,
                   help="depth table TSV (chrom pos alt1 ref1 alt2 ref2)")
    p.add_argument("-win", "--window", type=int, default=1_000_000,
                   help="smoothing window (bp)")
    p.add_argument("-min-depth", "--min-depth", type=int, default=10)
    p.add_argument("-cols", "--cols", type=str,
                   default="chrom,pos,alt1,ref1,alt2,ref2",
                   help="column names in order chrom,pos,alt1,ref1,alt2,ref2")
    common.add_out_args(p, default_prefix="bsa")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "bsa")

    import pandas as pd

    from janusx_tpu.models.bsa import bsa_analysis

    cols = [c.strip() for c in args.cols.split(",")]
    if len(cols) != 6:
        raise SystemExit("-cols needs 6 names: chrom,pos,alt1,ref1,alt2,ref2")
    df = pd.read_csv(args.input, sep="\t")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise SystemExit(f"missing columns: {missing}")
    res = bsa_analysis(
        df[cols[0]].to_numpy(), df[cols[1]].to_numpy(),
        df[cols[2]].to_numpy(), df[cols[3]].to_numpy(),
        df[cols[4]].to_numpy(), df[cols[5]].to_numpy(),
        window_bp=args.window, min_depth=args.min_depth,
    )
    out = pd.DataFrame(
        {
            "chrom": res.chrom, "pos": res.pos,
            "snp_index1": res.snp_index1, "snp_index2": res.snp_index2,
            "delta_snp_index": res.delta, "G": res.g_stat, "Gprime": res.g_prime,
        }
    )
    path = prefix + ".bsa.tsv"
    out.to_csv(path, sep="\t", index=False, float_format="%.6g")
    print(path)
    return 0
