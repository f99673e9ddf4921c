"""`jx postgarfield` — plots for GARFIELD rule tables
(reference: script/postgarfield.py)."""

from __future__ import annotations

import argparse

from janusx_tpu.cli import common


def build_parser(prog="jx postgarfield") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="GARFIELD result plots")
    p.add_argument("-i", "--input", type=str, required=True,
                   help="rule table TSV from `jx garfield`")
    p.add_argument("-top", "--top", type=int, default=20)
    common.add_out_args(p, default_prefix="postgarfield")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    df = pd.read_csv(args.input, sep="\t")
    top = df.nlargest(args.top, "score")
    fig, ax = plt.subplots(figsize=(7, max(2.5, 0.3 * len(top))))
    colors = ["#C44E52" if p <= 0.05 else "#4C72B0" for p in top["pperm"]]
    ax.barh(range(len(top)), top["score"], color=colors)
    ax.set_yticks(range(len(top)))
    ax.set_yticklabels(top["rule"], fontsize=7)
    ax.invert_yaxis()
    ax.set_xlabel("rule score (corr²)")
    ax.spines[["top", "right"]].set_visible(False)
    fig.tight_layout()
    out = prefix + ".rules.png"
    fig.savefig(out, dpi=150)
    plt.close(fig)
    print(out)
    return 0
