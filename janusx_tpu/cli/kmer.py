"""`jx kmer` / `jx kmerge` / `jx kstats` — k-mer pipeline
(reference: src/kmer/ + script/kmer.py, kmerge.py, kstats.py)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from janusx_tpu.cli import common


def build_parser(prog="jx kmer") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="count k-mers per sample")
    p.add_argument("-i", "-fa", "--inputs", "--fa", dest="inputs", type=str,
                   nargs="+", required=True,
                   help="FASTA/FASTQ(.gz) files, one per sample "
                   "(reference spelling: -fa)")
    p.add_argument("-k", "--k", "--kmer-len", dest="k", type=int, default=21)
    p.add_argument("-min-count", "--min-count", "-ci", "--cutoff-min",
                   dest="min_count", type=int, default=2,
                   help="minimal k-mer count cutoff (reference -ci)")
    p.add_argument("-cx", "--cutoff-max", dest="max_count", type=int,
                   default=None,
                   help="maximal k-mer count cutoff (reference -cx)")
    p.add_argument("--counter-max", type=int, default=None,
                   help="cap stored counter values (reference KMC -cs)")
    p.add_argument("-mem", "--mem", "-m", "--max-ram-gb", "-limit-mem",
                   "--limit-mem", dest="mem", type=float, default=None,
                   metavar="GB",
                   help="in-RAM k-mer table budget in GB; tables that "
                   "would cross it spill to on-disk partition buckets "
                   "(KMC-class external-memory counting) and finalize "
                   "one bucket at a time (reference -m/-limit-mem)")
    p.add_argument("-spill-dir", "--spill-dir", "--tmp-dir",
                   dest="spill_dir", type=str, default=None,
                   help="directory for spill buckets (default: temp dir); "
                   "'' disables spilling — the counter then fails fast "
                   "at 2x the -mem budget instead of swapping "
                   "(reference --tmp-dir)")
    p.add_argument("-t", "--threads", dest="threads", type=int, default=None,
                   help="counter threads (default: all cores)")
    # reference hidden mode flags (kmer.py:585-597): -count is the
    # default behavior; -tree builds a presence-based NJ tree of the
    # counted samples on top of it
    p.add_argument("-count", "--count", action="store_true",
                   help=argparse.SUPPRESS)
    # remaining reference hidden WASTER tuning knobs (kmer.py:597-640):
    # the -tree analog here is presence-Jaccard NJ, so the read-sampling
    # parameters have no effect — accepted for dev command lines
    p.add_argument("--waster-mode", type=int, choices=(1, 2, 3, 4),
                   default=4, help=argparse.SUPPRESS)
    for flag, dv in (("--waster-sampled", 16), ("--waster-qcs", 30),
                     ("--waster-qcn", 20), ("--waster-pattern", 500_000_000),
                     ("--waster-consensus", 25_000_000)):
        p.add_argument(flag, type=int, default=dv, help=argparse.SUPPRESS)
    p.add_argument("--waster-continue-file", type=str, default=None,
                   help=argparse.SUPPRESS)
    p.add_argument("-tree", "--tree", action="store_true",
                   help="also build an NJ tree of the samples from "
                   "shared-k-mer (Jaccard) distances of the presence "
                   "matrix -> {prefix}.kmer.nwk (needs >= 3 inputs; "
                   "reference hidden -tree mode)")
    common.add_out_args(p, default_prefix="kmer")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "kmer")

    from janusx_tpu.models import kmer

    if not kmer.available():
        raise SystemExit("native k-mer counter unavailable (needs g++)")
    if args.tree and len(args.inputs) < 3:
        raise SystemExit("-tree needs at least 3 input samples")
    outputs = []
    per_sample = {}
    for path in args.inputs:
        sid = os.path.basename(path).split(".")[0]
        codes, counts = kmer.count_kmers(
            path, k=args.k, min_count=args.min_count,
            threads=args.threads,
            mem_budget_bytes=(None if args.mem is None
                              else int(args.mem * (1 << 30))),
            spill_dir=args.spill_dir,
        )
        if args.max_count is not None:
            keep = counts <= args.max_count
            codes, counts = codes[keep], counts[keep]
        if args.counter_max is not None:
            counts = np.minimum(counts, args.counter_max)
        out = f"{prefix}.{sid}.k{args.k}.npz"
        np.savez_compressed(out, codes=codes, counts=counts, k=args.k)
        outputs.append(out)
        if args.tree:
            per_sample[sid] = (codes, counts)
        print(f"{sid}\t{len(codes)} k-mers\t{out}")
    if args.tree:
        # presence-based sample phylogeny (functional analog of the
        # reference's hidden read-based WASTER tree mode): Jaccard
        # distance over the shared-k-mer presence matrix, RapidNJ join
        from janusx_tpu.models.tree import rapid_neighbor_joining

        codes_m, mat, samples = kmer.merge_to_matrix(
            per_sample, min_samples=1, max_samples=len(per_sample))
        P = mat.astype(np.float64)  # (m, n) presence
        inter = P.T @ P
        sizes = P.sum(axis=0)
        union = sizes[:, None] + sizes[None, :] - inter
        D = 1.0 - inter / np.maximum(union, 1.0)
        np.fill_diagonal(D, 0.0)
        nwk = rapid_neighbor_joining(D, list(samples))
        tree_path = f"{prefix}.kmer.nwk"
        with open(tree_path, "wt") as fh:
            fh.write(nwk + "\n")
        print(f"tree\t{len(codes_m)} shared k-mers\t{tree_path}")
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
        kf = int(z["k"])
        if k is not None and kf != k:
            # codes from different k live in different integer spaces;
            # merging them would be silent data corruption
            raise SystemExit(
                f"{path} was counted with k={kf} but earlier inputs use "
                f"k={k}; re-run jx kmer with one k for all samples"
            )
        k = kf
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
    p.add_argument("-i", "-db", "--inputs", dest="inputs", type=str, nargs="+",
                   required=True, help="per-sample k-mer DBs (.npz from `jx kmer`)")
    p.add_argument("-sid", "--sample-id", nargs="+", default=None,
                   help="sample IDs in the same order as the inputs")
    p.add_argument("-pair", "--pair", choices=("union", "intersection", "both"),
                   default=None,
                   help="write pairwise lower-triangle set-size matrices")
    p.add_argument("-venn", "--venn", action="store_true",
                   help="presence-pattern counts (classic 2-sample row; one "
                        "row per observed pattern for >2 samples)")
    common.add_out_args(p, default_prefix="kstats")
    args = p.parse_args(argv)
    prefix = common.out_prefix(args)

    dbs = [np.load(path) for path in args.inputs]
    sids = (list(args.sample_id) if args.sample_id
            else [_sample_id(p_) for p_ in args.inputs])
    if len(sids) != len(dbs):
        raise SystemExit("-sid count must match the number of inputs")
    print("sample\tn_kmers\ttotal_count\tmean_count\tmax_count")
    for sid, z in zip(sids, dbs):
        c = z["counts"]
        print(
            f"{sid}\t{len(c)}\t{int(c.sum())}\t{c.mean():.2f}\t{int(c.max()) if len(c) else 0}"
        )
    outputs = []
    if args.pair:
        codes = [np.sort(z["codes"]) for z in dbs]
        n = len(codes)
        inter = np.zeros((n, n), np.int64)
        union = np.zeros((n, n), np.int64)
        for i in range(n):
            inter[i, i] = union[i, i] = len(codes[i])
            for j in range(i):
                ni = len(np.intersect1d(codes[i], codes[j], assume_unique=True))
                inter[i, j] = inter[j, i] = ni
                union[i, j] = union[j, i] = len(codes[i]) + len(codes[j]) - ni

        def _write(mat, tag):
            path = f"{prefix}.pair.{tag}.tsv"
            with open(path, "wt") as fh:
                fh.write("\t" + "\t".join(sids) + "\n")
                for i in range(n):
                    # lower triangle (reference: lower-triangle matrices)
                    row = "\t".join(str(mat[i, j]) if j <= i else ""
                                    for j in range(n))
                    fh.write(f"{sids[i]}\t{row}\n")
            outputs.append(path)

        if args.pair in ("union", "both"):
            _write(union, "union")
        if args.pair in ("intersection", "both"):
            _write(inter, "intersection")
    if args.venn:
        if len(dbs) > 64:
            raise SystemExit(
                f"-venn supports at most 64 inputs (got {len(dbs)}): the "
                f"presence pattern is a 64-bit mask"
            )
        all_codes = np.unique(np.concatenate([z["codes"] for z in dbs]))
        pattern = np.zeros(len(all_codes), np.uint64)
        for i, z in enumerate(dbs):
            idx = np.searchsorted(all_codes, np.sort(z["codes"]))
            pattern[idx] |= np.uint64(1 << i)
        pats, counts = np.unique(pattern, return_counts=True)
        path = f"{prefix}.venn.tsv"
        with open(path, "wt") as fh:
            fh.write("pattern\t" + "\t".join(sids) + "\tcount\n")
            for pat, cnt in zip(pats, counts):
                bits = [(int(pat) >> i) & 1 for i in range(len(dbs))]
                fh.write("".join(map(str, bits)) + "\t"
                         + "\t".join(map(str, bits)) + f"\t{cnt}\n")
        if len(dbs) == 2:
            only_a = int(counts[list(pats).index(1)]) if 1 in pats else 0
            only_b = int(counts[list(pats).index(2)]) if 2 in pats else 0
            shared = int(counts[list(pats).index(3)]) if 3 in pats else 0
            print(f"venn\tonly_{sids[0]}={only_a}\tonly_{sids[1]}={only_b}"
                  f"\tshared={shared}")
        outputs.append(path)
    if outputs:
        print("\t".join(outputs))
    return 0
