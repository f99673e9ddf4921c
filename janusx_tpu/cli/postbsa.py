"""`jx postbsa` — BSA post-analysis: thresholds + genome plots.

Reference: /root/reference/python/janusx/script/postbsa.py (window G/G'
recompute, CI-percentile thresholds, per-chromosome genome panels).

Input: the `jx bsa` output TSV (chrom pos snp_index1 snp_index2
delta_snp_index G Gprime). Produces:

- {prefix}.postbsa.tsv — per-SNP table extended with simulated null
  Δ-SNP confidence bounds (Takagi et al.: binomial resampling of both
  bulk depths at p=0.5, per depth pair), G' p-values from a lognormal
  null fitted on the Hampel-trimmed G' distribution (QTLseqr semantics),
  and BH-FDR q-values.
- {prefix}.bsa.png — stacked per-chromosome panels: Δ-SNP index with CI
  band + windowed mean, and -log10 p(G') track.
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from janusx_tpu.cli import common

log = logging.getLogger("janusx_tpu.postbsa")


def build_parser(prog="jx postbsa") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="BSA thresholds + plots")
    p.add_argument("-i", "--input", type=str, required=True,
                   help="jx bsa output TSV")
    p.add_argument("-d", "--depths", type=str, default=None,
                   help="original depth TSV (chrom pos alt1 ref1 alt2 ref2) "
                        "for exact per-SNP CI simulation; omit to use the "
                        "median depth")
    p.add_argument("-win", "--window", type=int, default=1_000_000,
                   help="window for the smoothed Δ-SNP track (bp)")
    p.add_argument("-ci", "--ci", type=float, default=95.0,
                   help="CI percentile for the Δ-SNP null band")
    p.add_argument("-sims", "--sims", type=int, default=10_000,
                   help="null simulation replicates per depth pair")
    p.add_argument("-fdr", "--fdr", type=float, default=0.05,
                   help="G' BH-FDR significance level")
    p.add_argument("-no-plot", "--no-plot", action="store_true")
    common.add_out_args(p, default_prefix="postbsa")
    return p


def simulate_delta_ci(
    d1: np.ndarray, d2: np.ndarray, q: float, sims: int, seed: int = 0,
    max_bins: int = 256,
) -> np.ndarray:
    """Per-SNP |Δ-SNP| null quantile via binomial resampling at p=0.5.

    Depth pairs are binned (both depths clipped at the max_bins-th
    percentile grid) so the simulation runs once per distinct pair —
    the reference simulates per depth pair too (postbsa.py CI tables)."""
    rng = np.random.default_rng(seed)
    d1 = np.clip(d1.astype(np.int64), 1, None)
    d2 = np.clip(d2.astype(np.int64), 1, None)
    pairs, inv = np.unique(np.stack([d1, d2], 1), axis=0, return_inverse=True)
    if len(pairs) > max_bins:
        # quantize both depth axes to ~sqrt(max_bins) levels
        lev = int(np.sqrt(max_bins))
        qs = np.linspace(0, 100, lev)
        g1 = np.unique(np.percentile(d1, qs).astype(np.int64))
        g2 = np.unique(np.percentile(d2, qs).astype(np.int64))
        q1 = g1[np.clip(np.searchsorted(g1, d1), 0, len(g1) - 1)]
        q2 = g2[np.clip(np.searchsorted(g2, d2), 0, len(g2) - 1)]
        pairs, inv = np.unique(np.stack([q1, q2], 1), axis=0, return_inverse=True)
    thr = np.empty(len(pairs))
    for i, (a, b) in enumerate(pairs):
        x1 = rng.binomial(a, 0.5, size=sims) / a
        x2 = rng.binomial(b, 0.5, size=sims) / b
        thr[i] = np.percentile(np.abs(x1 - x2), q)
    return thr[inv]


def gprime_pvalues(gp: np.ndarray) -> np.ndarray:
    """Lognormal null p-values for G' (QTLseqr / Magwene et al.):
    estimate null mean/var from the Hampel-trimmed (outlier-removed)
    log G' distribution, then p = 1 - lognorm.cdf."""
    from scipy import stats as sp

    gp = np.asarray(gp, float)
    ok = np.isfinite(gp) & (gp > 0)
    lg = np.log(gp[ok])
    med = np.median(lg)
    mad = np.median(np.abs(lg - med)) * 1.4826
    keep = np.abs(lg - med) <= 5.2 * mad  # Hampel rule
    mu, sd = float(np.mean(lg[keep])), float(np.std(lg[keep]))
    p = np.ones_like(gp)
    p[ok] = sp.norm.sf(np.log(gp[ok]), loc=mu, scale=max(sd, 1e-12))
    return p


def bh_fdr(p: np.ndarray) -> np.ndarray:
    """Benjamini-Hochberg q-values."""
    p = np.asarray(p, float)
    m = len(p)
    order = np.argsort(p)
    ranked = p[order] * m / (np.arange(m) + 1)
    qv = np.minimum.accumulate(ranked[::-1])[::-1]
    out = np.empty(m)
    out[order] = np.clip(qv, 0, 1)
    return out


def window_mean(pos: np.ndarray, val: np.ndarray, window: int) -> np.ndarray:
    """Centered sliding-window mean over a sorted position axis."""
    half = window // 2
    lo = np.searchsorted(pos, pos - half, side="left")
    hi = np.searchsorted(pos, pos + half, side="right")
    c = np.concatenate([[0.0], np.cumsum(np.nan_to_num(val))])
    k = np.concatenate([[0], np.cumsum(np.isfinite(val).astype(np.int64))])
    cnt = np.maximum(k[hi] - k[lo], 1)
    return (c[hi] - c[lo]) / cnt


def plot_bsa(df, prefix: str, ci_pct: float, fdr: float) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    chroms = list(dict.fromkeys(df["chrom"]))
    fig, axes = plt.subplots(
        2, len(chroms), figsize=(max(8, 2.2 * len(chroms)), 5.2),
        sharey="row", squeeze=False, gridspec_kw={"wspace": 0.06},
    )
    sig_any = df["gprime_q"] <= fdr
    for j, ch in enumerate(chroms):
        sub = df[df["chrom"] == ch]
        mb = sub["pos"] / 1e6
        ax = axes[0][j]
        ax.scatter(mb, sub["delta_snp_index"], s=2, c="#b8c4d0", rasterized=True)
        ax.plot(mb, sub["delta_smoothed"], c="#1f4e79", lw=1.2)
        ax.plot(mb, sub["delta_ci_hi"], c="#c0504d", lw=0.8, ls="--")
        ax.plot(mb, -sub["delta_ci_hi"], c="#c0504d", lw=0.8, ls="--")
        ax.set_ylim(-1.05, 1.05)
        ax.set_title(str(ch), fontsize=9)
        if j == 0:
            ax.set_ylabel("Δ(SNP-index)")
        ax2 = axes[1][j]
        lp = -np.log10(np.clip(sub["gprime_p"], 1e-300, 1.0))
        ax2.scatter(mb, lp, s=2, c="#9caf88", rasterized=True)
        sig = sub["gprime_q"] <= fdr
        if sig.any():
            ax2.scatter(mb[sig], lp[sig], s=4, c="#c0504d", rasterized=True)
        if sig_any.any():
            thr_p = df.loc[sig_any, "gprime_p"].max()
            ax2.axhline(-np.log10(max(thr_p, 1e-300)), c="#c0504d", lw=0.8, ls=":")
        ax2.set_xlabel("Mb")
        if j == 0:
            ax2.set_ylabel("-log10 p(G')")
    fig.suptitle(f"BSA: Δ-SNP index ({ci_pct:g}% CI) and G' significance", y=0.995)
    path = prefix + ".bsa.png"
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return path


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "postbsa")

    import pandas as pd

    df = pd.read_csv(args.input, sep="\t")
    need = {"chrom", "pos", "delta_snp_index", "Gprime"}
    missing = need - set(df.columns)
    if missing:
        raise SystemExit(f"missing columns in {args.input}: {sorted(missing)}")
    df = df.sort_values(["chrom", "pos"], kind="stable").reset_index(drop=True)

    if args.depths:
        dd = pd.read_csv(args.depths, sep="\t")
        dd = dd.sort_values(["chrom", "pos"], kind="stable").reset_index(drop=True)
        key = ["chrom", "pos"]
        # duplicated positions (e.g. multiallelic rows) would inflate the
        # left-merge beyond len(df): keep the first depth row per site
        dd = dd.drop_duplicates(subset=key, keep="first")
        merged = df[key].merge(dd, on=key, how="left")
        d1 = (merged["alt1"] + merged["ref1"]).to_numpy(float)
        d2 = (merged["alt2"] + merged["ref2"]).to_numpy(float)
        d1 = np.where(np.isfinite(d1), d1, np.nanmedian(d1))
        d2 = np.where(np.isfinite(d2), d2, np.nanmedian(d2))
    else:
        # no depth file: flat CI from a nominal depth (the bsa TSV has no
        # depths; warn so users know the band is approximate)
        log.warning("no -d depth table: using a flat 40x CI band")
        d1 = np.full(len(df), 40.0)
        d2 = np.full(len(df), 40.0)
    df["delta_ci_hi"] = simulate_delta_ci(d1, d2, args.ci, args.sims)

    parts = []
    for ch, sub in df.groupby("chrom", sort=False):
        sm = window_mean(
            sub["pos"].to_numpy(np.int64),
            sub["delta_snp_index"].to_numpy(float), args.window,
        )
        parts.append(pd.Series(sm, index=sub.index))
    df["delta_smoothed"] = pd.concat(parts).sort_index()

    df["gprime_p"] = gprime_pvalues(df["Gprime"].to_numpy())
    df["gprime_q"] = bh_fdr(df["gprime_p"].to_numpy())
    df["sig_delta"] = np.abs(df["delta_smoothed"]) > df["delta_ci_hi"]
    df["sig_gprime"] = df["gprime_q"] <= args.fdr

    out = prefix + ".postbsa.tsv"
    df.to_csv(out, sep="\t", index=False, float_format="%.6g")
    print(out)
    n_sig = int(df["sig_gprime"].sum())
    log.info("G' significant SNPs at FDR %.2g: %d", args.fdr, n_sig)
    if not args.no_plot:
        print(plot_bsa(df, prefix, args.ci, args.fdr))
    return 0
