"""Genotype + phenotype simulation (``jx sim``).

Replaces the reference's SimEngine / g2p_simulate
(/root/reference/src/io/sim.rs, src/sim/g2p.rs): HWE genotype draws with
uniform allele-frequency spectrum, optional missingness, then an additive
QTL phenotype with a target heritability (PVE).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from janusx_tpu.io.gdata import GenotypeData, SiteInfo


@dataclass
class SimResult:
    genotypes: GenotypeData
    phenotypes: np.ndarray  # (n, n_traits)
    qtl_idx: np.ndarray
    qtl_effects: np.ndarray


def simulate_genotypes(
    n_samples: int,
    n_snps: int,
    maf_low: float = 0.05,
    maf_high: float = 0.5,
    missing_rate: float = 0.0,
    n_chrom: int = 5,
    seed: int = 0,
) -> GenotypeData:
    rng = np.random.default_rng(seed)
    p = rng.uniform(maf_low, maf_high, size=n_snps)
    g = rng.binomial(2, p[:, None], size=(n_snps, n_samples)).astype(np.int8)
    if missing_rate > 0:
        g[rng.random(g.shape) < missing_rate] = -1
    chrom = np.array(
        [str(1 + (i * n_chrom) // n_snps) for i in range(n_snps)], object
    )
    # positions restart per chromosome at 1e4 spacing
    pos = np.zeros(n_snps, np.int64)
    counter: dict = {}
    for i, c in enumerate(chrom):
        counter[c] = counter.get(c, 0) + 1
        pos[i] = counter[c] * 10_000
    sites = SiteInfo(
        chrom=chrom,
        pos=pos,
        snp=np.array([f"snp{i + 1}" for i in range(n_snps)], object),
        allele0=np.array(["A"] * n_snps, object),
        allele1=np.array(["G"] * n_snps, object),
    )
    samples = np.array([f"ind{i + 1}" for i in range(n_samples)], object)
    return GenotypeData(g, sites, samples)


def simulate_phenotype(
    gdata: GenotypeData,
    n_qtl: int = 50,
    h2: float = 0.5,
    n_traits: int = 1,
    effect_dist: str = "normal",  # "normal" | "gamma"
    seed: int = 0,
) -> SimResult:
    rng = np.random.default_rng(seed + 1)
    g = gdata.genotypes.astype(np.float64)
    g[gdata.genotypes < 0] = np.nan
    means = np.nanmean(g, axis=1)
    gc = np.nan_to_num(g - means[:, None])
    phenos = np.empty((gdata.n, n_traits))
    qtl_idx = np.sort(rng.choice(gdata.m, size=min(n_qtl, gdata.m), replace=False))
    if effect_dist == "gamma":
        eff = rng.gamma(0.4, 1.0, size=len(qtl_idx)) * rng.choice([-1, 1], len(qtl_idx))
    else:
        eff = rng.normal(size=len(qtl_idx))
    gv = gc[qtl_idx].T @ eff
    vg = np.var(gv)
    ve = vg * (1.0 - h2) / max(h2, 1e-9) if vg > 0 else 1.0
    for t in range(n_traits):
        phenos[:, t] = gv + rng.normal(size=gdata.n) * np.sqrt(ve)
    return SimResult(
        genotypes=gdata, phenotypes=phenos, qtl_idx=qtl_idx, qtl_effects=eff
    )


def write_pheno(path: str, samples, phenos: np.ndarray, names=None) -> None:
    t = phenos.shape[1]
    names = names or [f"trait{i}" for i in range(t)]
    with open(path, "wt") as fh:
        fh.write("\t" + "\t".join(names) + "\n")
        for i, s in enumerate(samples):
            vals = "\t".join(
                "NA" if not np.isfinite(phenos[i, j]) else f"{phenos[i, j]:.6f}"
                for j in range(t)
            )
            fh.write(f"{s}\t{vals}\n")
