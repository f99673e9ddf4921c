"""GARFIELD: logic-rule (epistasis) association search.

TPU-native re-design of the reference's GARFIELD engine
(/root/reference/src/garfield/: packed 0/1 homozygote bitsets, AND/XOR
beam search, correlation/MCC scoring, permutation null calibration, GRM
residualization — ~38k LoC of Rust/Metal).

Redesign: binary SNP features (hom-alt indicators) are rows of a 0/1
matrix B (m, n). Scoring a rule vector v against the residualized
phenotype r uses the point-biserial correlation, which needs only
Σ v_i r_i, Σ v_i and Σ r² — so scoring EVERY AND-extension of a beam seed
against EVERY marker reduces to two MXU matmuls:

    num[s, j]  = (b_s ∘ r) · b_j     -> (S, n) @ (n, m)
    cnt[s, j]  = b_s · b_j           -> (S, n) @ (n, m)

XOR extensions derive from the same products plus the single-marker
sums. The beam keeps the top-B rules per depth; significance comes from
a maxT permutation null (the reference's permutation calibration).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from janusx_tpu.io.packed import PackedGenotypes

_EPS = 1e-9


@partial(jax.jit, static_argnames=())
def _extension_scores(Bseed, B, r, r2sum):
    """Correlation scores of AND/XOR extensions.

    Bseed: (S, n) 0/1 seed rule vectors; B: (m, n) 0/1 marker features;
    r: (n,) centered residual. Returns (score_and, score_xor, cnt_and).
    """
    hp = jax.lax.Precision.HIGHEST
    n = B.shape[1]
    br = Bseed * r[None, :]
    num_and = jnp.dot(br, B.T, precision=hp)  # (S, m): Σ r over AND support
    cnt_and = jnp.dot(Bseed, B.T, precision=hp)  # (S, m)
    seed_cnt = jnp.sum(Bseed, axis=1)[:, None]
    seed_num = jnp.sum(br, axis=1)[:, None]
    mark_cnt = jnp.sum(B, axis=1)[None, :]
    mark_num = jnp.dot(B, r, precision=hp)[None, :]
    # XOR = seed + marker - 2*AND
    num_xor = seed_num + mark_num - 2.0 * num_and
    cnt_xor = seed_cnt + mark_cnt - 2.0 * cnt_and

    def corr2(num, cnt):
        # point-biserial: corr² = num² / (r'r · cnt (1 - cnt/n))
        p = cnt / n
        var = cnt * (1.0 - p)
        return jnp.where(
            (var > _EPS) & (cnt >= 5) & (cnt <= n - 5),
            (num * num) / (r2sum * jnp.maximum(var, _EPS)),
            0.0,
        )

    return corr2(num_and, cnt_and), corr2(num_xor, cnt_xor), cnt_and


@dataclass
class Rule:
    snps: tuple  # marker indices
    ops: tuple  # "VAR", then "AND"/"XOR" per extension
    score: float  # corr^2 with residual
    support: int  # carriers

    def describe(self, snp_names) -> str:
        parts = [str(snp_names[self.snps[0]])]
        for op, idx in zip(self.ops[1:], self.snps[1:]):
            parts.append(f"{op} {snp_names[idx]}")
        return " ".join(parts)


@dataclass
class GarfieldResult:
    rules: list  # Rule, sorted by score desc
    perm_max_scores: np.ndarray  # maxT null distribution
    pvalues: np.ndarray  # empirical p per rule


def _residualize(y, covariates, K=None):
    y = np.asarray(y, np.float64).reshape(-1)
    n = len(y)
    X = np.ones((n, 1)) if covariates is None else np.concatenate(
        [np.ones((n, 1)), np.asarray(covariates, np.float64)], axis=1
    )
    if K is not None:
        from janusx_tpu.gs.blup import fit_gblup

        mdl = fit_gblup(K, y, np.arange(n), None if covariates is None else covariates)
        u = K @ mdl.alpha
        r = y - X @ np.linalg.lstsq(X, y, rcond=None)[0] - u
    else:
        b, *_ = np.linalg.lstsq(X, y, rcond=None)
        r = y - X @ b
    return r - r.mean()


def _beam_search(B, r, depth, beam, snp_min_support):
    m, n = B.shape
    r = jnp.asarray(r, jnp.float32)
    r2sum = jnp.dot(r, r, precision=jax.lax.Precision.HIGHEST)
    Bj = jnp.asarray(B, jnp.float32)
    # depth-1 scores
    cnt1 = np.asarray(jnp.sum(Bj, axis=1))
    num1 = np.asarray(jnp.dot(Bj, r, precision=jax.lax.Precision.HIGHEST))
    p1 = cnt1 / n
    var1 = cnt1 * (1 - p1)
    with np.errstate(divide="ignore", invalid="ignore"):
        s1 = np.where(
            (var1 > _EPS) & (cnt1 >= snp_min_support) & (cnt1 <= n - snp_min_support),
            num1**2 / (float(r2sum) * np.maximum(var1, _EPS)),
            0.0,
        )
    order = np.argsort(s1)[::-1]
    rules: list[Rule] = [
        Rule((int(i),), ("VAR",), float(s1[i]), int(cnt1[i]))
        for i in order[:beam]
    ]
    frontier = [(ru, B[ru.snps[0]]) for ru in rules]
    all_rules = list(rules)
    for _d in range(1, depth):
        seeds = np.stack([v for _, v in frontier]).astype(np.float32)
        sa, sx, ca = _extension_scores(jnp.asarray(seeds), Bj, r, r2sum)
        sa = np.asarray(sa)
        sx = np.asarray(sx)
        ca = np.asarray(ca)
        cand = []
        for si, (ru, vec) in enumerate(frontier):
            for op, scores in (("AND", sa[si]), ("XOR", sx[si])):
                top = np.argsort(scores)[::-1][: max(4, beam // len(frontier))]
                for j in top:
                    if int(j) in ru.snps or scores[j] <= ru.score + 1e-9:
                        continue
                    cand.append((float(scores[j]), si, int(j), op))
        cand.sort(reverse=True)
        next_frontier = []
        seen = set()
        for score, si, j, op in cand:
            ru, vec = frontier[si]
            key = (tuple(sorted(ru.snps + (j,))), op)
            if key in seen:
                continue
            seen.add(key)
            newvec = (
                vec & B[j] if op == "AND" else vec ^ B[j]
            ).astype(np.uint8)
            new_rule = Rule(
                ru.snps + (j,), ru.ops + (op,), score, int(newvec.sum())
            )
            next_frontier.append((new_rule, newvec))
            if len(next_frontier) >= beam:
                break
        if not next_frontier:
            break
        frontier = next_frontier
        all_rules.extend(ru for ru, _ in frontier)
    all_rules.sort(key=lambda ru: ru.score, reverse=True)
    return all_rules


def garfield_scan(
    pg: PackedGenotypes,
    y: np.ndarray,
    covariates: np.ndarray | None = None,
    K: np.ndarray | None = None,
    depth: int = 2,
    beam: int = 64,
    n_perm: int = 100,
    top_rules: int = 50,
    min_support: int = 5,
    seed: int = 0,
) -> GarfieldResult:
    """Search AND/XOR rules over hom-alt indicators; maxT permutation p."""
    d = pg.dosages()
    B = (d == 2).astype(np.uint8)  # hom-alt bitplanes (reference bitsets)
    r = _residualize(y, covariates, K)
    rules = _beam_search(B, r, depth, beam, min_support)[:top_rules]

    # permutation null: max depth-1..depth score under shuffled residuals
    rng = np.random.default_rng(seed)
    null_max = np.empty(n_perm)
    for p_i in range(n_perm):
        rp = rng.permutation(r)
        null_rules = _beam_search(B, rp, depth, max(8, beam // 4), min_support)
        null_max[p_i] = null_rules[0].score if null_rules else 0.0
    scores = np.array([ru.score for ru in rules])
    pvals = np.array(
        [(1 + np.sum(null_max >= s)) / (n_perm + 1) for s in scores]
    )
    return GarfieldResult(rules=rules, perm_max_scores=null_max, pvalues=pvals)


def write_garfield_tsv(path: str, res: GarfieldResult, sites) -> None:
    with open(path, "wt") as fh:
        fh.write("rule\tdepth\tsupport\tscore\tpperm\n")
        for ru, p in zip(res.rules, res.pvalues):
            fh.write(
                f"{ru.describe(sites.snp)}\t{len(ru.snps)}\t{ru.support}"
                f"\t{ru.score:.6g}\t{p:.4g}\n"
            )
