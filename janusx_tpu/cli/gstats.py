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
    o.add_argument("-ldscore", "--ldscore", type=int, default=None, metavar="WIN",
                   help="also compute per-site LD scores over a WIN-SNP window")
    o.add_argument("-king", "--king", nargs="?", type=float, const=0.0884,
                   default=None, metavar="THRESH",
                   help="KING-robust related pairs above THRESH (default "
                   "0.0884 = 2nd degree) + greedy unrelated set; tiled "
                   "sweep, scales to biobank n")
    o.add_argument("-king-tile", "--king-tile", type=int, default=8192)
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
        ld = None
        if args.ldscore:
            from janusx_tpu.models.ldprune import _corr_chunk
            from janusx_tpu.io.packed import QcParams
            from janusx_tpu.ops import decode as _dec
            import jax.numpy as jnp

            # LD score: per-site sum of r^2 with neighbors in the window
            from janusx_tpu.io.packed import pack_from_codes

            pgq = pack_from_codes(raw.packed, n, raw.sites, raw.samples,
                                  QcParams(maf=0.0, geno=1.0))
            win = int(args.ldscore)
            ld = np.zeros(raw.m)
            packed_pad = _dec.pad_packed_cols(pgq.packed)
            step = 2048
            for s0 in range(0, pgq.m, step):
                e0 = min(s0 + step + win, pgq.m)
                r = np.asarray(_corr_chunk(
                    jnp.asarray(packed_pad[s0:e0]),
                    jnp.asarray(pgq.mean[s0:e0].astype(np.float32)),
                ))
                r2 = r * r
                hi = min(s0 + step, pgq.m)
                for li in range(hi - s0):
                    lo = max(0, li - win)
                    up = min(e0 - s0, li + win + 1)
                    ld[s0 + li] = r2[li, lo:up].sum() - 1.0
        path = f"{prefix}.site.stats.tsv"
        with open(path, "wt") as fh:
            hdr = "chrom\tpos\tsnp\tallele0\tallele1\taf\tmaf\tmiss\thet"
            if ld is not None:
                hdr += "\tldscore"
            fh.write(hdr + "\n")
            s = raw.sites
            for i in range(raw.m):
                row = (
                    f"{s.chrom[i]}\t{s.pos[i]}\t{s.snp[i]}\t{s.allele0[i]}\t{s.allele1[i]}"
                    f"\t{af[i]:.6g}\t{maf[i]:.6g}\t{miss[i]:.6g}\t{het_rate[i]:.6g}"
                )
                if ld is not None:
                    row += f"\t{ld[i]:.6g}"
                fh.write(row + "\n")
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
    if args.king is not None:
        from janusx_tpu.io.packed import QcParams, pack_from_codes
        from janusx_tpu.models.king import (
            king_related_pairs,
            unrelated_set_from_pairs,
        )

        pgq = pack_from_codes(raw.packed, n, raw.sites, raw.samples,
                              QcParams(maf=0.01, geno=0.2))
        ii, jj, vv = king_related_pairs(
            pgq, threshold=args.king, tile=args.king_tile
        )
        path = f"{prefix}.king.pairs.tsv"
        with open(path, "wt") as fh:
            fh.write("sample_i\tsample_j\tkinship\n")
            for i, j, v in zip(ii, jj, vv):
                fh.write(f"{raw.samples[i]}\t{raw.samples[j]}\t{v:.6g}\n")
        keep = unrelated_set_from_pairs(ii, jj, n)
        upath = f"{prefix}.king.unrelated.id"
        with open(upath, "wt") as fh:
            for k in keep:
                fh.write(f"{raw.samples[k]}\n")
        print(f"KING: {len(ii)} related pairs > {args.king}; "
              f"unrelated set {len(keep)}/{n}")
        outputs += [path, upath]
    print("\t".join(outputs))
    return 0
