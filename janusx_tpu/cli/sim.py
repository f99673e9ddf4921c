"""`jx sim` — simulate genotypes + phenotypes (reference: script/sim.py).

With a genotype input (-bfile/-vcf/-hmp/-file) it switches to g2p mode
(reference script/simulation.py): phenotypes simulated FROM the existing
panel, with causal-site eligibility controls (-lmaf MAF bounds,
-bimrange chr:start:end regions, -gff gene-restricted causals)."""

from __future__ import annotations

import argparse

from janusx_tpu.cli import common


def build_parser(prog="jx sim") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="Simulate genotypes + phenotypes")
    common.add_genotype_args(p, required=False)
    g2p = p.add_argument_group("g2p mode (phenotype from existing genotypes)")
    g2p.add_argument("-causal", "--causal", type=int, default=None,
                     help="number of causal sites (g2p alias of -nqtl)")
    g2p.add_argument("-lmaf", "--lmaf", nargs="+", type=float, default=None,
                     metavar="MAF", help="causal-site MAF bounds: LO [HI]")
    g2p.add_argument("-bimrange", "--bimrange", action="append", default=[],
                     metavar="CHR:START:END", help="repeatable causal region")
    g2p.add_argument("-gff", "--gff", type=str, default=None,
                     help="restrict causal sites to gene features in this GFF3")
    g = p.add_argument_group("Simulation")
    g.add_argument("-nind", "--nind", type=int, default=1000, help="samples")
    g.add_argument("-nsnp", "--nsnp", type=int, default=10000, help="SNPs")
    g.add_argument("-nchr", "--nchr", type=int, default=5, help="chromosomes")
    g.add_argument("-nqtl", "--nqtl", type=int, default=50, help="causal QTLs")
    g.add_argument("-h2", "--h2", type=float, default=0.5, help="heritability")
    g.add_argument("-ntrait", "--ntrait", type=int, default=1)
    g.add_argument("-miss", "--miss", type=float, default=0.0, help="missing rate")
    g.add_argument("-maf-low", "--maf-low", type=float, default=0.05)
    g.add_argument("-maf-high", "--maf-high", type=float, default=0.5,
                   help="upper MAF bound for simulated sites")
    g.add_argument("-homo", "--homo", action="store_true",
                   help="pure homozygous genotypes (0/2 only — inbred "
                   "DH/RIL-style panels; reference -homo)")
    g.add_argument("-seed", "--seed", type=int, default=0)
    g.add_argument("-pve", "--pve", dest="h2_alias", type=float, default=None,
                   help="alias of -h2 (reference -pve)")
    g.add_argument("-ve", "--ve", type=float, default=None,
                   help="environmental variance scale: phenotypes are "
                   "rescaled so var(e) = VE (reference -ve; default "
                   "leaves total variance 1)")
    g.add_argument("-trait-name", "--trait-name", type=str, default=None,
                   help="trait column name(s) in .pheno (comma list)")
    g.add_argument("-na-rate", "--na-rate", type=float, default=None,
                   help="also write {prefix}.pheno.NA.txt with this "
                   "missing rate injected (reference -na-rate)")
    g.add_argument("-chunksize", "--chunksize", type=int, default=None,
                   help=argparse.SUPPRESS)  # reference streaming knob;
    # generation here is vectorized in RAM at supported sizes
    s = p.add_argument_group("Structure & architecture (g2p)")
    s.add_argument("-structure", "--structure", type=str, default="unrelated",
                   choices=["unrelated", "family", "mixed"],
                   help="population layout (families = 2 parents + offspring)")
    s.add_argument("-family-size", "--family-size", type=int, default=5)
    s.add_argument("-family-frac", "--family-frac", type=float, default=0.5,
                   help="fraction of samples in families (mixed mode)")
    s.add_argument("-effect-model", "--effect-model", type=str, default="random",
                   choices=["random", "equal", "geometric"])
    s.add_argument("-effect-dist", "--effect-dist", type=str, default="normal",
                   choices=["normal", "gamma", "laplace"])
    s.add_argument("-dom-pve", "--dom-pve", type=float, default=0.0,
                   help="dominance-deviation share of h2")
    s.add_argument("-epi-pairs", "--epi-pairs", type=int, default=0,
                   help="number of epistatic logic-gate pairs")
    s.add_argument("-epi-pve", "--epi-pve", type=float, default=0.0,
                   help="epistasis share of h2")
    s.add_argument("-gate", "--gate", type=str, default="A",
                   choices=["A", "NA", "AN", "NAN", "X"],
                   help="logic gate over hom-alt indicators")
    s.add_argument("-bg-pve", "--bg-pve", type=float, default=0.0,
                   help="polygenic-background share of h2")
    p.add_argument("--chunk-size", dest="chunk_size", type=int, default=None,
                   help=argparse.SUPPRESS)  # reference streaming knob;
    # generation here is blocked internally
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

    import numpy as np

    g2p_mode = any((args.bfile, args.vcf, args.hmp, args.file))
    causal_pool = None
    if g2p_mode:
        from janusx_tpu.io.gfreader import load_genotype_file

        gd = load_genotype_file(common.resolve_genotype(args))
        elig = np.ones(gd.m, bool)
        if args.lmaf:
            lo = float(args.lmaf[0])
            hi = float(args.lmaf[1]) if len(args.lmaf) > 1 else 0.5
            g = gd.genotypes.astype(np.float64)
            obs = g >= 0
            af = np.where(obs, g, 0).sum(1) / np.maximum(2.0 * obs.sum(1), 1)
            maf = np.minimum(af, 1 - af)
            elig &= (maf >= lo) & (maf <= hi)
        if args.bimrange:
            rmask = np.zeros(gd.m, bool)
            chrom = np.asarray(gd.sites.chrom, dtype=object).astype(str)
            pos = np.asarray(gd.sites.pos, np.int64)
            for tok in args.bimrange:
                parts = tok.split(":")
                if len(parts) != 3:
                    raise SystemExit(f"-bimrange wants CHR:START:END, got {tok!r}")
                c, a, b = parts[0], int(parts[1]), int(parts[2])
                rmask |= (chrom == c) & (pos >= a) & (pos <= b)
            elig &= rmask
        if args.gff:
            from janusx_tpu.utils.gff import GffIndex

            gi = GffIndex.from_file(args.gff)
            chrom = np.asarray(gd.sites.chrom, dtype=object).astype(str)
            pos = np.asarray(gd.sites.pos, np.int64)
            elig &= np.fromiter(
                (bool(gi.query(c, int(p))) for c, p in zip(chrom, pos)),
                bool, count=gd.m)
        causal_pool = np.nonzero(elig)[0]
    else:
        gd = simulate_genotypes(
            args.nind, args.nsnp, maf_low=args.maf_low,
            maf_high=args.maf_high, missing_rate=args.miss,
            n_chrom=args.nchr, seed=args.seed, structure=args.structure,
            family_size=args.family_size, family_frac=args.family_frac,
            homozygous=args.homo,
        )
    # `or` would turn an explicit -causal 0 (pure-epistasis designs) into
    # the nqtl default
    n_qtl = args.causal if args.causal is not None else args.nqtl
    h2 = args.h2 if args.h2_alias is None else args.h2_alias
    sim = simulate_phenotype(
        gd, n_qtl=n_qtl, h2=h2, n_traits=args.ntrait,
        seed=args.seed,
        effect_dist=args.effect_dist, effect_model=args.effect_model,
        dominance_pve=args.dom_pve, epistasis_pairs=args.epi_pairs,
        epistasis_pve=args.epi_pve, epistasis_gate=args.gate,
        bg_pve=args.bg_pve, causal_pool=causal_pool,
    )
    phenos = sim.phenotypes
    if args.ve is not None:
        # rescale so the environmental variance equals VE while keeping
        # the h2 share (total variance is h2+(1-h2)=1 before scaling)
        if h2 >= 1.0:
            raise SystemExit("-ve needs h2 < 1")
        phenos = phenos * float(np.sqrt(args.ve / (1.0 - h2)))
    names = (args.trait_name.split(",") if args.trait_name else None)
    if names is not None and len(names) != phenos.shape[1]:
        if len(names) == 1:
            names = [f"{names[0]}{i}" for i in range(phenos.shape[1])]
        else:
            raise SystemExit(
                f"-trait-name: {len(names)} names for {phenos.shape[1]} traits")
    if not g2p_mode:
        plink.write_plink_genotypes(prefix, gd)
    write_pheno(prefix + ".pheno", gd.samples, phenos, names=names)
    if args.na_rate is not None:
        # reference -na-rate: a second phenotype file with injected NAs
        # (GS prediction-set demos)
        rng_na = np.random.default_rng(args.seed + 7)
        pna = phenos.copy()
        pna[rng_na.random(pna.shape) < args.na_rate] = np.nan
        write_pheno(prefix + ".pheno.NA.txt", gd.samples, pna, names=names)
    with open(prefix + ".qtl.tsv", "wt") as fh:
        fh.write("snp\tchrom\tpos\teffect\tkind\n")
        for k, (i, e) in enumerate(zip(sim.qtl_idx, sim.qtl_effects)):
            fh.write(
                f"{gd.sites.snp[i]}\t{gd.sites.chrom[i]}\t{gd.sites.pos[i]}"
                f"\t{e:.6g}\tadditive\n"
            )
            if sim.dom_effects is not None:
                fh.write(
                    f"{gd.sites.snp[i]}\t{gd.sites.chrom[i]}\t"
                    f"{gd.sites.pos[i]}\t{sim.dom_effects[k]:.6g}\tdominance\n"
                )
        for i, j, gate, e in sim.epi_pairs:
            fh.write(
                f"{gd.sites.snp[i]}*{gd.sites.snp[j]}\t{gd.sites.chrom[i]}\t"
                f"{gd.sites.pos[i]}\t{e:.6g}\tepistasis[{gate}]\n"
            )
    if sim.components:
        import json

        with open(prefix + ".sim.json", "wt") as fh:
            json.dump({"components": sim.components,
                       "structure": args.structure}, fh, indent=2)
    if g2p_mode:
        print(f"{prefix}.pheno\t{prefix}.qtl.tsv\t(g2p from existing genotypes,"
              f" causal pool {len(causal_pool)}/{gd.m})")
    else:
        print(f"{prefix}.bed/.bim/.fam\t{prefix}.pheno\t{prefix}.qtl.tsv")
    return 0
