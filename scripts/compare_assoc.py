#!/usr/bin/env python
"""Diff association p-value columns across the external-benchmark tools.

Reads whatever result files scripts/benchmark_external.sh produced under
its results dir, joins them on SNP id, and prints one TSV row per tool
pair: SNP overlap, Pearson r of -log10(p), max |Δ -log10(p)|, and
top-hit agreement — the parity statistic the reference publishes for its
rMVP/GEMMA comparisons (/root/reference/doc/release/v1.0.26.md:49).

Tolerant by design: missing tools simply contribute no rows.
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np


def _read_table(path, sep=None):
    import csv

    rows = []
    with open(path, "rt") as fh:
        sample = fh.read(4096)
        fh.seek(0)
        delim = sep or ("," if sample.count(",") > sample.count("\t") else "\t")
        for rec in csv.reader(fh, delimiter=delim):
            if rec:
                rows.append(rec)
    return rows


def _pcol(header, names):
    low = [h.strip().lower() for h in header]
    for nm in names:
        if nm in low:
            return low.index(nm)
    return None


def load_generic(path, snp_names, p_names):
    rows = _read_table(path)
    if not rows:
        return {}
    si = _pcol(rows[0], snp_names)
    pi = _pcol(rows[0], p_names)
    if si is None or pi is None:
        return {}
    out = {}
    for rec in rows[1:]:
        try:
            out[rec[si]] = float(rec[pi])
        except (ValueError, IndexError):
            continue
    return out


def discover(res_dir):
    """tool name -> {snp: p}."""
    found = {}
    jx = glob.glob(os.path.join(res_dir, "jx", "*.assoc.tsv"))
    if jx:
        found["jx"] = load_generic(jx[0], ["snp", "rs"], ["pwald", "p"])
    gemma = os.path.join(res_dir, "gemma", "assoc.assoc.txt")
    if os.path.exists(gemma):
        found["gemma"] = load_generic(gemma, ["rs"], ["p_wald"])
    for mlma in glob.glob(os.path.join(res_dir, "gcta*.mlma")):
        found["gcta"] = load_generic(mlma, ["snp"], ["p"])
    for f in glob.glob(os.path.join(res_dir, "rmvp*", "*.csv")) + glob.glob(
            os.path.join(res_dir, "rmvp*.csv")):
        d = load_generic(f, ["snp", "marker"],
                         ["trait1.mlm", "p", "pvalue", "p.value"])
        if d:
            found["rmvp"] = d
    for f in glob.glob(os.path.join(res_dir, "regenie*.regenie")):
        rows = _read_table(f, sep=" ")
        if rows:
            si = _pcol(rows[0], ["id"])
            pi = _pcol(rows[0], ["log10p"])
            if si is not None and pi is not None:
                found["regenie"] = {
                    r[si]: 10.0 ** -float(r[pi])
                    for r in rows[1:] if len(r) > max(si, pi)
                }
    return found


def main(res_dir):
    tools = {k: v for k, v in discover(res_dir).items() if v}
    print("tool_a\ttool_b\tn_shared\tpearson_neglogp\tmax_dlogp\ttophit_match")
    names = sorted(tools)
    if "jx" in names:  # jx first in every pair
        names.remove("jx")
        names.insert(0, "jx")
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            shared = sorted(set(tools[a]) & set(tools[b]))
            if not shared:
                print(f"{a}\t{b}\t0\tnan\tnan\tno")
                continue
            pa = np.array([tools[a][s] for s in shared])
            pb = np.array([tools[b][s] for s in shared])
            ok = (pa > 0) & (pb > 0) & np.isfinite(pa) & np.isfinite(pb)
            shared_ok = [s for s, o in zip(shared, ok) if o]
            la, lb = -np.log10(pa[ok]), -np.log10(pb[ok])
            r = float(np.corrcoef(la, lb)[0, 1]) if ok.sum() > 2 else np.nan
            dmax = float(np.abs(la - lb).max()) if ok.sum() else np.nan
            tophit = (
                shared_ok[int(np.argmax(la))] == shared_ok[int(np.argmax(lb))]
                if ok.sum() else False)
            print(f"{a}\t{b}\t{int(ok.sum())}\t{r:.6f}\t{dmax:.4f}"
                  f"\t{'yes' if tophit else 'no'}")
    if len(names) < 2:
        print(f"# only {names or 'no tools'} produced results — external "
              "tools were skipped (not on PATH); table will fill in an "
              "environment that has them", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
