"""`jx postgs` — GS diagnostics from summary/gebv artifacts
(reference: script/postgs.py)."""

from __future__ import annotations

import argparse
import json

from janusx_tpu.cli import common


def build_parser(prog="jx postgs") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="GS CV plots + tables")
    p.add_argument("-i", "--summary", type=str, required=True,
                   help="{prefix}.gs.summary.json from `jx gs`")
    common.add_out_args(p, default_prefix="postgs")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "postgs")

    from janusx_tpu.plots.gsplots import cv_fold_bars

    summary = json.load(open(args.summary))
    rows = []
    for trait, methods in summary.get("traits", {}).items():
        for method, info in methods.items():
            cv = info.get("cv", {})
            folds = info.get("folds", [])
            rows.append(
                (trait, method, info.get("route", method),
                 cv.get("pearson"), cv.get("spearman"), cv.get("r2"))
            )
            if folds:
                cv_fold_bars(
                    folds, f"{prefix}.{trait}.{method}.cv.png", metric="pearson"
                )
    table = f"{prefix}.gs.metrics.tsv"
    with open(table, "wt") as fh:
        fh.write("trait\tmethod\troute\tpearson\tspearman\tr2\n")
        for r in rows:
            fh.write("\t".join("" if v is None else str(v) for v in r) + "\n")
    print(table)
    return 0
