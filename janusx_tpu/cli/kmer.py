"""`jx kmer` / `jx kmerge` / `jx kstats` — k-mer pipeline
(reference: src/kmer/ + script/kmer.py, kmerge.py, kstats.py)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from janusx_tpu.cli import common


def build_parser(prog="jx kmer") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="count k-mers per sample")
    p.add_argument("-i", "--inputs", type=str, nargs="+", required=True,
                   help="FASTA/FASTQ(.gz) files, one per sample")
    p.add_argument("-k", "--k", type=int, default=21)
    p.add_argument("-min-count", "--min-count", type=int, default=2)
    common.add_out_args(p, default_prefix="kmer")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "kmer")

    from janusx_tpu.models import kmer

    if not kmer.available():
        raise SystemExit("native k-mer counter unavailable (needs g++)")
    outputs = []
    for path in args.inputs:
        sid = os.path.basename(path).split(".")[0]
        codes, counts = kmer.count_kmers(path, k=args.k, min_count=args.min_count)
        out = f"{prefix}.{sid}.k{args.k}.npz"
        np.savez_compressed(out, codes=codes, counts=counts, k=args.k)
        outputs.append(out)
        print(f"{sid}\t{len(codes)} k-mers\t{out}")
    return 0


def _sample_id(path: str) -> str:
    """Sample ID from a `jx kmer` output name: strips the .k{K}.npz suffix
    and any leading out-prefix component ({prefix}.{sid}.k{K}.npz)."""
    import re

    base = os.path.basename(path)
    base = re.sub(r"\.k\d+\.npz$", "", base)
    return base.rsplit(".", 1)[-1]


def kmerge_main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="jx kmerge",
                                description="merge per-sample k-mer counts to a presence matrix")
    p.add_argument("-i", "--inputs", type=str, nargs="+", required=True,
                   help="per-sample .npz count files from `jx kmer`")
    p.add_argument("-min-samples", "--min-samples", type=int, default=2)
    common.add_out_args(p, default_prefix="kmerged")
    args = p.parse_args(argv)
    prefix = common.out_prefix(args)

    from janusx_tpu.io import plink
    from janusx_tpu.models import kmer

    per_sample = {}
    k = None
    for path in args.inputs:
        z = np.load(path)
        per_sample[_sample_id(path)] = (z["codes"], z["counts"])
        k = int(z["k"])
    codes, mat, samples = kmer.merge_to_matrix(
        per_sample, min_samples=args.min_samples
    )
    gd = kmer.kmer_matrix_to_genotypes(codes, mat, samples, k)
    plink.write_plink_genotypes(prefix, gd)
    # BIN01 interchange matrix (presence bits + 2-bit k-mer sidecar —
    # reference kmerge emits JXBIN001, src/io/bincore.rs:7-32)
    from janusx_tpu.io import bin01
    from janusx_tpu.models.kmer import decode_kmer

    with bin01.Bin01Writer(prefix + ".bin", len(samples), "kmer") as bw:
        kmers = [decode_kmer(int(c), k) for c in codes]
        bw.write_rows(mat > 0, kmers)
    bin01.write_samples(prefix + ".bin", samples)
    print(f"{prefix}.bed + {prefix}.bin\t{gd.m} segregating k-mers x {gd.n} samples")
    return 0


def kstats_main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="jx kstats", description="k-mer count statistics")
    p.add_argument("-i", "--inputs", type=str, nargs="+", required=True)
    args = p.parse_args(argv)
    print("sample\tn_kmers\ttotal_count\tmean_count\tmax_count")
    for path in args.inputs:
        z = np.load(path)
        sid = os.path.basename(path).split(".")[0]
        c = z["counts"]
        print(
            f"{sid}\t{len(c)}\t{int(c.sum())}\t{c.mean():.2f}\t{int(c.max()) if len(c) else 0}"
        )
    return 0
