"""`jx garfield` — logic-rule (epistasis) association search
(reference: src/garfield/ + script/garfield CLI)."""

from __future__ import annotations

import argparse

from janusx_tpu.cli import common


def build_parser(prog="jx garfield") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="AND/XOR logic-rule search")
    common.add_genotype_args(p)
    common.add_pheno_args(p)
    common.add_qc_args(p)
    o = p.add_argument_group("Search")
    o.add_argument("-depth", "--depth", type=int, default=2, help="max rule depth")
    o.add_argument("-beam", "--beam", type=int, default=64, help="beam width")
    o.add_argument("-perm", "--perm", type=int, default=100, help="permutations")
    o.add_argument("-grm", "--grm-residualize", action="store_true",
                   help="residualize on the GRM (mixed-model residuals)")
    o.add_argument("-seed", "--seed", type=int, default=0)
    o.add_argument("-binary", "--binary", action="store_true",
                   help="force binary-trait MCC scoring (auto-detected for 0/1 traits)")
    o.add_argument("-preselect", "--preselect", type=int, default=0,
                   help="ML feature pre-selection: keep top-K markers before the beam")
    o.add_argument("-bin", "--bin", type=str, default=None, metavar="PATH",
                   help="search a BIN01 0/1 feature matrix (k-mer presence) "
                   "instead of genotype hom-alt indicators")
    o.add_argument("-windows", "--windows", type=float, default=None, metavar="KB",
                   help="window-restricted scans of this size in kb")
    common.add_out_args(p, default_prefix="garfield")
    return p


def _main_bin(args, prefix: str) -> int:
    """Rule search over a BIN01 0/1 feature matrix (k-mer presence bits —
    reference garfield window/bin scans, src/lib.rs:751-767)."""
    import numpy as np

    from janusx_tpu.io import bin01
    from janusx_tpu.io.pheno import load_phenotype
    from janusx_tpu.models.garfield import garfield_scan_features
    from janusx_tpu.models.scan_common import analysis_sample_index

    bm = bin01.read_bin01(args.bin)
    samples = bin01.read_samples(bm.path, bm.n_samples)
    sites = bm.sites()
    names = np.array(
        [
            (s if isinstance(s, str) else f"{s[0]}:{s[1]}")
            for s in (sites or [])
        ]
        + [f"b{i}" for i in range(len(sites or []), bm.n_rows)],
        object,
    )
    ph = load_phenotype(args.pheno).select(common.parse_traits(args.ncol))
    y_all, _ = ph.align(samples)
    dense = bm.dense()
    for ti, trait in enumerate(ph.traits):
        y = y_all[:, ti]
        keep = analysis_sample_index(y)
        B = dense[:, keep]
        ttype = "binary" if args.binary else "auto"
        res = garfield_scan_features(
            B, y[keep], depth=args.depth, beam=args.beam, n_perm=args.perm,
            seed=args.seed, trait_type=ttype, preselect=args.preselect,
        )
        path = f"{prefix}.{trait}.garfield.bin.tsv"
        with open(path, "wt") as fh:
            fh.write("rule\tdepth\tsupport\tscore\tpperm\n")
            for ru, pv in zip(res.rules, res.pvalues):
                fh.write(
                    f"{ru.describe(names)}\t{len(ru.snps)}\t{ru.support}"
                    f"\t{ru.score:.6g}\t{pv:.4g}\n"
                )
        best = res.rules[0] if res.rules else None
        if best:
            print(f"{trait}\ttop: {best.describe(names)}\t"
                  f"score={best.score:.4g}\tp={res.pvalues[0]:.4g}\t{path}")
        else:
            print(f"{trait}\tno rules\t{path}")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "garfield")

    import numpy as np

    from janusx_tpu.io.gfreader import load_raw_packed
    from janusx_tpu.io.packed import QcParams
    from janusx_tpu.io.pheno import load_phenotype
    from janusx_tpu.models.garfield import garfield_scan, write_garfield_tsv
    from janusx_tpu.models.grm import grm_from_packed
    from janusx_tpu.models.scan_common import analysis_sample_index

    if args.bin:
        return _main_bin(args, prefix)
    raw = load_raw_packed(common.resolve_genotype(args))
    ph = load_phenotype(args.pheno).select(common.parse_traits(args.ncol))
    y_all, _ = ph.align(raw.samples)
    qc = QcParams(maf=args.maf, geno=args.geno, het=args.het)
    outputs = []
    for ti, trait in enumerate(ph.traits):
        y = y_all[:, ti]
        keep = analysis_sample_index(y)
        pg = raw.prepare(qc, sample_idx=keep)
        K = grm_from_packed(pg) if args.grm_residualize else None
        ttype = "binary" if args.binary else "auto"
        if args.windows:
            from janusx_tpu.models.garfield import garfield_window_scan

            wins = garfield_window_scan(
                pg, y[keep], window_kb=args.windows, K=K, depth=args.depth,
                beam=args.beam, n_perm=args.perm, seed=args.seed,
                trait_type=ttype, preselect=args.preselect,
            )
            path = f"{prefix}.{trait}.garfield.windows.tsv"
            with open(path, "wt") as fh:
                fh.write("chrom\tstart\tend\trule\tdepth\tsupport\tscore\tpperm\n")
                for c, s, e, r in wins:
                    for ru, pv in zip(r.rules, r.pvalues):
                        fh.write(
                            f"{c}\t{s}\t{e}\t{ru.describe(pg.sites.snp)}\t"
                            f"{len(ru.snps)}\t{ru.support}\t{ru.score:.6g}\t{pv:.4g}\n"
                        )
            outputs.append(path)
            print(f"{trait}\t{len(wins)} windows\t{path}")
            continue
        res = garfield_scan(
            pg, y[keep], K=K, depth=args.depth, beam=args.beam,
            n_perm=args.perm, seed=args.seed, trait_type=ttype,
            preselect=args.preselect,
        )
        path = f"{prefix}.{trait}.garfield.tsv"
        write_garfield_tsv(path, res, pg.sites)
        outputs.append(path)
        best = res.rules[0] if res.rules else None
        if best:
            print(
                f"{trait}\ttop: {best.describe(pg.sites.snp)}\t"
                f"score={best.score:.4g}\tp={res.pvalues[0]:.4g}\t{path}"
            )
    return 0
