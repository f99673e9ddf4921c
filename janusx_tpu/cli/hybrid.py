"""`jx hybrid` — hybrid (F1) performance prediction from parent genotypes
(reference: python/janusx/script/hybrid.py).

Trains GBLUP on phenotyped parents, then predicts every requested F1
cross using the expected hybrid dosage g_F1 = (g_p1 + g_p2)/2 (additive
expectation; missing parent genotypes fall back to the parent mean)."""

from __future__ import annotations

import argparse
import itertools

import numpy as np

from janusx_tpu.cli import common


def build_parser(prog="jx hybrid") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description="F1 hybrid prediction")
    common.add_genotype_args(p)
    common.add_pheno_args(p)
    common.add_qc_args(p)
    o = p.add_argument_group("Options")
    o.add_argument("-crosses", "--crosses", type=str, default=None,
                   help="TSV of p1<TAB>p2 crosses (default: all pairs)")
    o.add_argument("-top", "--top", type=int, default=50, help="report top N crosses")
    common.add_out_args(p, default_prefix="hybrid")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    prefix = common.out_prefix(args)
    common.setup_logging(args.verbose, prefix, "hybrid")

    from janusx_tpu.gs.blup import fit_gblup, marker_effects
    from janusx_tpu.io.gfreader import prepare_packed
    from janusx_tpu.io.packed import QcParams
    from janusx_tpu.io.pheno import load_phenotype
    from janusx_tpu.models.grm import grm_denominator, grm_from_packed

    pg = prepare_packed(
        common.resolve_genotype(args),
        QcParams(maf=args.maf, geno=args.geno, het=args.het),
    )
    ph = load_phenotype(args.pheno).select(common.parse_traits(args.ncol))
    y_all, _ = ph.align(pg.samples)
    y = y_all[:, 0]
    train = np.nonzero(np.isfinite(y))[0]
    if len(train) < 10:
        raise SystemExit("too few phenotyped parents")
    K = grm_from_packed(pg)
    model = fit_gblup(K, y, train)
    eff = marker_effects(pg, _alpha_full(model, pg.n), grm_denominator(pg))

    # centered parent dosages
    Z = pg.centered()  # (m, n)
    gv_parent = Z.T @ eff  # parental GEBV deviations
    mu = float(model.beta[0])

    ids = {str(s): i for i, s in enumerate(pg.samples)}
    if args.crosses:
        crosses = []
        for ln in open(args.crosses):
            f = ln.split()
            if len(f) >= 2 and f[0] in ids and f[1] in ids:
                crosses.append((f[0], f[1]))
    else:
        names = [str(s) for s in pg.samples]
        crosses = list(itertools.combinations(names, 2))
    rows = []
    for p1, p2 in crosses:
        i, j = ids[p1], ids[p2]
        # E[g_F1] = (g_p1 + g_p2)/2  ->  additive gebv = mean of parents
        pred = mu + 0.5 * (gv_parent[i] + gv_parent[j])
        rows.append((p1, p2, pred))
    rows.sort(key=lambda r: -r[2])
    path = f"{prefix}.hybrid.tsv"
    with open(path, "wt") as fh:
        fh.write("parent1\tparent2\tpredicted\n")
        for p1, p2, v in rows:
            fh.write(f"{p1}\t{p2}\t{v:.4f}\n")
    for p1, p2, v in rows[: args.top]:
        pass
    print(f"{path}\t{len(rows)} crosses\tbest: {rows[0][0]} x {rows[0][1]} = {rows[0][2]:.3f}")
    return 0


def _alpha_full(model, n: int) -> np.ndarray:
    alpha = np.zeros(n)
    alpha[model.train_idx] = model.alpha
    return alpha
