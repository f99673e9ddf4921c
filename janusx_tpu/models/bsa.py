"""Bulked-segregant analysis preprocessing.

Replaces the reference BSA module (/root/reference/src/stats/bsa.rs:
Δ-SNP index and G' statistics). Input: per-site ALT/REF allele depths of
two bulks. Outputs SNP-index per bulk, ΔSNP-index, the G statistic and
tricube-smoothed G' over a sliding window (Magwene et al. 2011).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class BsaResult:
    chrom: np.ndarray
    pos: np.ndarray
    snp_index1: np.ndarray
    snp_index2: np.ndarray
    delta: np.ndarray
    g_stat: np.ndarray
    g_prime: np.ndarray


def snp_index(alt: np.ndarray, ref: np.ndarray) -> np.ndarray:
    tot = alt + ref
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(tot > 0, alt / tot, np.nan)


def g_statistic(alt1, ref1, alt2, ref2) -> np.ndarray:
    """Standard BSA G statistic (2*sum obs*ln(obs/exp) over the 2x2 table)."""
    obs = np.stack([alt1, ref1, alt2, ref2], axis=1).astype(np.float64)
    n = obs.sum(axis=1, keepdims=True)
    row1 = (obs[:, 0] + obs[:, 1])[:, None]
    row2 = (obs[:, 2] + obs[:, 3])[:, None]
    col_alt = (obs[:, 0] + obs[:, 2])[:, None]
    col_ref = (obs[:, 1] + obs[:, 3])[:, None]
    exp = np.concatenate(
        [row1 * col_alt, row1 * col_ref, row2 * col_alt, row2 * col_ref], axis=1
    ) / np.maximum(n, 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where((obs > 0) & (exp > 0), obs * np.log(obs / exp), 0.0)
    return 2.0 * terms.sum(axis=1)


def tricube_smooth(
    chrom: np.ndarray, pos: np.ndarray, values: np.ndarray, window_bp: int
) -> np.ndarray:
    """Per-chromosome tricube-weighted local mean (G' smoothing)."""
    chrom = np.asarray(chrom).astype(str)
    pos = np.asarray(pos, np.float64)
    out = np.full(len(values), np.nan)
    half = window_bp / 2.0
    for c in dict.fromkeys(chrom):
        sel = np.nonzero(chrom == c)[0]
        p = pos[sel]
        v = values[sel]
        order = np.argsort(p)
        p, v, sel_o = p[order], v[order], sel[order]
        lo = np.searchsorted(p, p - half, side="left")
        hi = np.searchsorted(p, p + half, side="right")
        for k in range(len(p)):
            idx = slice(lo[k], hi[k])
            d = np.abs(p[idx] - p[k]) / max(half, 1.0)
            w = (1 - np.minimum(d, 1.0) ** 3) ** 3
            vv = v[idx]
            ok = np.isfinite(vv) & (w > 0)
            if ok.any():
                out[sel_o[k]] = np.average(vv[ok], weights=w[ok])
    return out


def bsa_analysis(
    chrom, pos, alt1, ref1, alt2, ref2,
    window_bp: int = 1_000_000,
    min_depth: int = 10,
) -> BsaResult:
    chrom = np.asarray(chrom)
    pos = np.asarray(pos, np.int64)
    alt1, ref1, alt2, ref2 = (
        np.asarray(a, np.float64) for a in (alt1, ref1, alt2, ref2)
    )
    ok = (alt1 + ref1 >= min_depth) & (alt2 + ref2 >= min_depth)
    i1 = np.where(ok, snp_index(alt1, ref1), np.nan)
    i2 = np.where(ok, snp_index(alt2, ref2), np.nan)
    # reference convention: Delta.SNPindex(bulk2-bulk1) (bsa.rs:226,282)
    delta = i2 - i1
    g = np.where(ok, g_statistic(alt1, ref1, alt2, ref2), np.nan)
    gp = tricube_smooth(chrom, pos, g, window_bp)
    return BsaResult(
        chrom=chrom, pos=pos, snp_index1=i1, snp_index2=i2, delta=delta,
        g_stat=g, g_prime=gp,
    )
