"""Manhattan and QQ plots for association results.

Replaces the reference bioplotkit Manhattan/QQ plotting
(/root/reference/python/janusx/bioplotkit/manhanden.py, stat.py;
exact beta-distribution QQ confidence bands as in
src/stats/plot.rs qq_band_beta_logp_exact).
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from scipy import stats as sp_stats  # noqa: E402

_PALETTE = ["#4C72B0", "#DD8452"]


def manhattan_plot(
    chrom: np.ndarray,
    pos: np.ndarray,
    pvals: np.ndarray,
    out_path: str,
    sig_line: float | None = None,
    title: str | None = None,
    dpi: int = 150,
) -> None:
    chrom = np.asarray(chrom).astype(str)
    pos = np.asarray(pos, np.float64)
    with np.errstate(divide="ignore"):
        logp = -np.log10(np.clip(np.asarray(pvals, np.float64), 1e-300, 1.0))
    order_chr = list(dict.fromkeys(chrom))
    fig, ax = plt.subplots(figsize=(11, 3.6))
    offset = 0.0
    ticks, labels = [], []
    for i, c in enumerate(order_chr):
        sel = chrom == c
        x = pos[sel] - pos[sel].min() + offset
        ax.scatter(x, logp[sel], s=4, c=_PALETTE[i % 2], rasterized=True, lw=0)
        ticks.append(offset + (x.max() - offset) / 2 if len(x) else offset)
        labels.append(c)
        offset = (x.max() if len(x) else offset) + (pos[sel].max() - pos[sel].min()) * 0.02 + 1
    if sig_line is None:
        m = max(len(pvals), 1)
        sig_line = 0.05 / m
    ax.axhline(-np.log10(sig_line), color="red", ls="--", lw=0.8)
    ax.set_xticks(ticks)
    ax.set_xticklabels(labels, fontsize=8)
    ax.set_xlabel("Chromosome")
    ax.set_ylabel(r"$-\log_{10}(p)$")
    if title:
        ax.set_title(title)
    ax.spines[["top", "right"]].set_visible(False)
    fig.tight_layout()
    fig.savefig(out_path, dpi=dpi)
    plt.close(fig)


def qq_plot(
    pvals: np.ndarray,
    out_path: str,
    title: str | None = None,
    band: bool = True,
    dpi: int = 150,
) -> float:
    """QQ plot with exact beta-distribution confidence band; returns the
    genomic-inflation factor lambda_GC."""
    p = np.asarray(pvals, np.float64)
    p = p[np.isfinite(p) & (p > 0) & (p <= 1)]
    p = np.sort(p)
    m = len(p)
    if m == 0:
        raise ValueError("no valid p-values")
    exp = -np.log10((np.arange(1, m + 1) - 0.5) / m)
    obs = -np.log10(p)
    chi2 = sp_stats.chi2.isf(p, df=1)
    lambda_gc = float(np.median(chi2) / sp_stats.chi2.ppf(0.5, df=1))

    fig, ax = plt.subplots(figsize=(4.2, 4.2))
    if band:
        ranks = np.arange(1, m + 1)
        lo = -np.log10(sp_stats.beta.ppf(0.975, ranks, m - ranks + 1))
        hi = -np.log10(sp_stats.beta.ppf(0.025, ranks, m - ranks + 1))
        ax.fill_between(exp, lo, hi, color="#cccccc", alpha=0.5, lw=0)
    lim = max(exp.max(), obs.max()) * 1.05
    ax.plot([0, lim], [0, lim], color="red", lw=0.8)
    ax.scatter(exp, obs, s=5, c=_PALETTE[0], rasterized=True, lw=0)
    ax.set_xlabel(r"Expected $-\log_{10}(p)$")
    ax.set_ylabel(r"Observed $-\log_{10}(p)$")
    label = title or ""
    ax.set_title(f"{label} $\\lambda_{{GC}}$={lambda_gc:.3f}".strip())
    ax.spines[["top", "right"]].set_visible(False)
    fig.tight_layout()
    fig.savefig(out_path, dpi=dpi)
    plt.close(fig)
    return lambda_gc
