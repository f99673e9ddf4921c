"""GS diagnostics plots (reference: bioplotkit/gsplot.py)."""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def pred_vs_obs_plot(y_true, y_pred, out_path: str, title: str | None = None,
                     dpi: int = 150) -> None:
    yt = np.asarray(y_true, float)
    yp = np.asarray(y_pred, float)
    ok = np.isfinite(yt) & np.isfinite(yp)
    yt, yp = yt[ok], yp[ok]
    fig, ax = plt.subplots(figsize=(4.2, 4.2))
    ax.scatter(yt, yp, s=10, alpha=0.6, c="#4C72B0", lw=0)
    if len(yt) > 1:
        lo = min(yt.min(), yp.min())
        hi = max(yt.max(), yp.max())
        ax.plot([lo, hi], [lo, hi], color="red", lw=0.8, ls="--")
        r = np.corrcoef(yt, yp)[0, 1]
        ttl = f"{title or ''}  r={r:.3f}".strip()
        ax.set_title(ttl)
    ax.set_xlabel("Observed")
    ax.set_ylabel("Predicted")
    ax.spines[["top", "right"]].set_visible(False)
    fig.tight_layout()
    fig.savefig(out_path, dpi=dpi)
    plt.close(fig)


def cv_fold_bars(fold_metrics: list, out_path: str, metric: str = "pearson",
                 dpi: int = 150) -> None:
    vals = [fm.get(metric, np.nan) for fm in fold_metrics]
    fig, ax = plt.subplots(figsize=(4.5, 3))
    ax.bar(range(len(vals)), vals, color="#4C72B0")
    ax.axhline(np.nanmean(vals), color="red", ls="--", lw=0.8)
    ax.set_xlabel("Fold")
    ax.set_ylabel(metric)
    ax.spines[["top", "right"]].set_visible(False)
    fig.tight_layout()
    fig.savefig(out_path, dpi=dpi)
    plt.close(fig)
