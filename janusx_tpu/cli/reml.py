"""`jx reml` — variance components / BLUE / BLUP from a phenotype table
(reference: python/janusx/script/reml.py).

Usage mirrors the reference:
  jx reml -p pheno.tsv -n Yield -c year,loc -o outdir
  jx reml -p pheno.tsv -n Yield -c year,loc -rc block -k prefix.cGRM.npy
The first table column is the sample/line ID; `-k` attaches a GRM (npy +
.id sidecar) as the covariance of the ID random term.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from janusx_tpu.cli import common


def build_parser(prog="jx reml") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="Multi-VC REML / BLUE / BLUP")
    p.add_argument("-p", "--pheno", type=str, required=True, help="phenotype table (first col = ID)")
    p.add_argument("-n", "--ncol", type=str, required=True, help="response column (name or zero-based index)")
    p.add_argument("-c", "--cov", type=str, default=None, help="fixed-effect columns, comma-separated (categorical auto one-hot)")
    p.add_argument("-rc", "--random-cov", type=str, default=None, help="random-effect columns, comma-separated")
    p.add_argument("-k", "--kinship", type=str, default=None, help="GRM .npy (with .id sidecar) for the ID random term")
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--tol", type=float, default=1e-6)
    common.add_out_args(p, default_prefix="reml")
    return p


def _load_table(path: str):
    import pandas as pd

    sep = "\t" if open(path).readline().count("\t") else r"\s+"
    return pd.read_csv(path, sep=sep)


def _is_numeric(col) -> bool:
    import pandas as pd

    return pd.api.types.is_numeric_dtype(col)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "reml")

    from janusx_tpu.models.vcomp import RandomTerm, ai_reml, onehot

    df = _load_table(args.pheno)
    id_col = df.columns[0]
    resp = args.ncol
    if resp not in df.columns:
        resp = df.columns[1 + int(resp)] if str(resp).isdigit() else resp
    if resp not in df.columns:
        raise SystemExit(f"response column {args.ncol!r} not found in {list(df.columns)}")
    keep = np.isfinite(np.asarray(df[resp], np.float64))
    df = df.loc[keep].reset_index(drop=True)
    y = df[resp].to_numpy(np.float64)
    N = len(y)

    # fixed effects: intercept + requested columns
    X_parts = [np.ones((N, 1))]
    fixed_names = ["intercept"]
    for c in (args.cov.split(",") if args.cov else []):
        c = c.strip()
        if not c:
            continue
        if c not in df.columns:
            raise SystemExit(f"fixed-effect column {c!r} not found")
        if _is_numeric(df[c]):
            X_parts.append(df[c].to_numpy(np.float64)[:, None])
            fixed_names.append(c)
        else:
            levels, Z = onehot(df[c].to_numpy(), drop_first=True)
            X_parts.append(Z)
            fixed_names += [f"{c}:{l}" for l in levels]
    X = np.concatenate(X_parts, axis=1)

    terms: list[RandomTerm] = []
    # genetic ID term
    ids = df[id_col].to_numpy().astype(str)
    levels, Zid = onehot(ids)
    K = None
    if args.kinship:
        K_full = np.load(args.kinship)
        id_path = os.path.splitext(args.kinship)[0] + ".id"
        if os.path.exists(id_path):
            kin_ids = np.array([l.split()[0] for l in open(id_path) if l.strip()])
        else:
            raise SystemExit(f"missing GRM id sidecar: {id_path}")
        pos = {s: i for i, s in enumerate(kin_ids)}
        missing = [l for l in levels if l not in pos]
        if missing:
            raise SystemExit(f"{len(missing)} table IDs absent from GRM ids, e.g. {missing[:3]}")
        sel = np.array([pos[l] for l in levels])
        K = K_full[np.ix_(sel, sel)]
    terms.append(RandomTerm(name=str(id_col), Z=Zid, K=K, levels=levels))

    for c in (args.random_cov.split(",") if args.random_cov else []):
        c = c.strip()
        if not c:
            continue
        if c not in df.columns:
            raise SystemExit(f"random-effect column {c!r} not found")
        lv, Z = onehot(df[c].to_numpy())
        terms.append(RandomTerm(name=c, Z=Z, levels=lv))

    res = ai_reml(y, X, terms, max_iter=args.max_iter, tol=args.tol,
                  verbose=args.verbose)
    res.fixed_names = fixed_names

    with open(f"{prefix}.vc.tsv", "wt") as fh:
        fh.write("term\tsigma2\tproportion\n")
        for nm in res.sigma2:
            fh.write(f"{nm}\t{res.sigma2[nm]:.6g}\t{res.h2[nm]:.6g}\n")
    with open(f"{prefix}.blue.tsv", "wt") as fh:
        fh.write("effect\testimate\tse\n")
        for nm, b, s in zip(fixed_names, res.blue, res.blue_se):
            fh.write(f"{nm}\t{b:.6g}\t{s:.6g}\n")
    for nm, (lv, u) in res.blups.items():
        with open(f"{prefix}.{nm}.blup.tsv", "wt") as fh:
            fh.write(f"{nm}\tblup\n")
            for l, v in zip(lv, u):
                fh.write(f"{l}\t{v:.6g}\n")
    h2_id = res.h2[str(id_col)]
    print(
        f"loglik={res.loglik:.4f}\titers={res.n_iter}\tconverged={res.converged}\t"
        f"h2({id_col})={h2_id:.4f}\t{prefix}.vc.tsv"
    )
    return 0
