"""Approximate maximum-likelihood phylogeny (FastTree-style).

Reference: /root/reference/src/stats/tree.rs optimize_nni_ml_jc69 (:2820)
— NJ starting topology refined under a Jukes-Cantor-type model with
nearest-neighbor-interchange (NNI) rounds and per-edge branch-length
optimization, with a site budget for large alignments
(ml_build_site_indices :1974). The reference also shells out to vendored
FastTree; this module is the in-process equivalent.

Model: k-state JC (k=2 for biallelic genotype characters — the
Cavender-Farris-Neyman model; k=4 for nucleotide alignments):
    P_same(t) = 1/k + (1 - 1/k) e^{-mu t},  P_diff(t) = (1 - e^{-mu t})/k
with mu = k/(k-1). The per-edge likelihood is then LINEAR in
x = e^{-mu t}:  L_site(x) = x*a_site + (1-x)*b_site/k, where a/b come
from the up/down Felsenstein messages — so each branch length solves a
1-D concave problem by Newton, and NNI configurations score with four
precomputed subtree messages (no global recompute per candidate).
Site-vectorized numpy f64; per-node rescaling guards underflow.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

MIN_BLEN = 1e-7
MAX_BLEN = 5.0


@dataclass
class MlTree:
    children: list  # list[list[int]]; leaves have []
    parent: np.ndarray  # (n_nodes,), -1 for root
    blen: np.ndarray  # (n_nodes,) branch length ABOVE each node
    labels: list  # leaf labels by node id (internal nodes: "")
    root: int
    n_leaves: int
    loglik: float = float("nan")
    # site-compressed alignment state
    partials: dict = field(default_factory=dict)


def parse_newick(s: str):
    """Parse a (rooted, arbitrary-degree) newick string -> MlTree skeleton."""
    s = s.strip().rstrip(";")
    children: list = []
    parent: list = []
    blen: list = []
    labels: list = []

    def new_node():
        children.append([])
        parent.append(-1)
        blen.append(MIN_BLEN)
        labels.append("")
        return len(children) - 1

    pos = 0

    def parse() -> int:
        nonlocal pos
        node = new_node()
        if s[pos] == "(":
            pos += 1
            while True:
                c = parse()
                parent[c] = node
                children[node].append(c)
                if s[pos] == ",":
                    pos += 1
                    continue
                if s[pos] == ")":
                    pos += 1
                    break
        m = re.match(r"[^,():;]*", s[pos:])
        label = m.group(0)
        pos += len(label)
        if label:
            labels[node] = label
        if pos < len(s) and s[pos] == ":":
            m = re.match(r":([0-9eE.+-]+)", s[pos:])
            blen[node] = max(float(m.group(1)), MIN_BLEN)
            pos += len(m.group(0))
        return node

    root = parse()
    n_leaves = sum(1 for c in children if not c)
    return MlTree(
        children=children, parent=np.array(parent), blen=np.array(blen),
        labels=labels, root=root, n_leaves=n_leaves,
    )


def to_newick(t: MlTree) -> str:
    def rec(v: int) -> str:
        if not t.children[v]:
            body = t.labels[v]
        else:
            body = "(" + ",".join(rec(c) for c in t.children[v]) + ")"
        if v == t.root:
            return body
        return f"{body}:{t.blen[v]:.6g}"

    return rec(t.root) + ";"


def _postorder(t: MlTree):
    order, stack = [], [t.root]
    while stack:
        v = stack.pop()
        order.append(v)
        stack.extend(t.children[v])
    return order[::-1]


def _pmul(msg: np.ndarray, x: float, k: int) -> np.ndarray:
    """Message through an edge with x = e^{-mu t}:
    (P(t) @ m)_y = x*m_y + (1-x)*sum(m)/k  (k-state JC)."""
    s = msg.sum(axis=1, keepdims=True)
    return x * msg + (1.0 - x) * s / k


def _x_of(blen, k):
    mu = k / (k - 1.0)
    return np.exp(-mu * np.clip(blen, MIN_BLEN, MAX_BLEN))


def _blen_of_x(x, k):
    mu = k / (k - 1.0)
    x = min(max(float(x), np.exp(-mu * MAX_BLEN)), np.exp(-mu * MIN_BLEN))
    return -np.log(x) / mu


def _down_pass(t: MlTree, leaf_part: dict, k: int):
    """Felsenstein pruning: down[v] (n_sites, k) + PER-SITE log-scalers
    (vectors, so site weights can reweight them — bootstrap-by-weights
    composes with -ml)."""
    down, scal = {}, {}
    for v in _postorder(t):
        if not t.children[v]:
            down[v] = leaf_part[v]
            scal[v] = 0.0
            continue
        acc = None
        sc = 0.0
        for c in t.children[v]:
            m = _pmul(down[c], _x_of(t.blen[c], k), k)
            acc = m if acc is None else acc * m
            sc = sc + scal[c]
        mx = np.maximum(acc.max(axis=1), 1e-300)
        down[v] = acc / mx[:, None]
        scal[v] = sc + np.log(mx)
    return down, scal


def _loglik_from_down(t: MlTree, down, scal, k: int, weights) -> float:
    """Weighted site log-likelihood: sum_s w_s * log L_s. Site weights are
    the multiplicities of a bootstrap resample (reference tree.rs weighted
    `scal` accumulation); None = all-ones."""
    site = (down[t.root] / k).sum(axis=1)
    site_log = np.log(np.maximum(site, 1e-300)) + scal[t.root]
    if weights is None:
        return float(site_log.sum())
    return float(site_log @ weights)


def _up_pass(t: MlTree, down, k: int):
    """Outside-subtree contexts. Returns (A, atnode):
    A[v] = message at parent(v) from everything EXCEPT v's subtree,
    BEFORE crossing v's edge (pairs with down[v] in the per-edge
    closed form); atnode[v] = the same context transported across v's
    edge, i.e. the rest-of-tree message AT node v. The uniform prior
    pi = 1/k factors out and is applied in the final site sum."""
    ones = np.ones_like(down[t.root])
    A: dict = {}
    atnode = {t.root: ones}
    order = [t.root]
    while order:
        v = order.pop()
        msgs = {
            c: _pmul(down[c], _x_of(t.blen[c], k), k) for c in t.children[v]
        }
        for c in t.children[v]:
            acc = atnode[v].copy()
            for s, m in msgs.items():
                if s != c:
                    acc = acc * m
            mx = np.maximum(acc.max(axis=1), 1e-300)
            acc = acc / mx[:, None]
            A[c] = acc
            atnode[c] = _pmul(acc, _x_of(t.blen[c], k), k)
            order.append(c)
    return A, atnode


def _edge_ab(up_v: np.ndarray, down_v: np.ndarray, k: int):
    """Per-site (a, b) so that L_site(x) = x*a + (1-x)*b/k for the edge
    above v: a = sum_y up_y down_y, b = (sum up)(sum down)."""
    a = (up_v * down_v).sum(axis=1)
    b = up_v.sum(axis=1) * down_v.sum(axis=1)
    return a, b


def _optimize_x(a: np.ndarray, b: np.ndarray, k: int, x0: float,
                weights=None) -> float:
    """Newton on f(x) = sum w*log(x*a + (1-x)*b/k), concave in x in (0,1)."""
    c = b / k
    d = a - c  # f = sum w*log(c + x*d)
    w = 1.0 if weights is None else weights
    x = min(max(x0, 1e-6), 1.0 - 1e-9)
    for _ in range(30):
        denom = c + x * d
        if np.any(denom <= 0):
            x = max(x * 0.5, 1e-9)
            continue
        g = (w * d / denom).sum()
        h = -(w * (d / denom) ** 2).sum()
        if h >= 0:
            break
        step = g / h
        x_new = min(max(x - step, 1e-9), 1.0 - 1e-12)
        if abs(x_new - x) < 1e-10:
            x = x_new
            break
        x = x_new
    return x


def optimize_branch_lengths(t: MlTree, leaf_part, k: int, rounds: int = 2,
                            weights=None):
    """Per-edge closed-form updates from shared (stale) messages are a
    Jacobi-style simultaneous step, which can overshoot — each round
    backtracks the full update vector until the global likelihood is
    non-decreasing (guaranteed monotone)."""
    down, scal = _down_pass(t, leaf_part, k)
    ll0 = _loglik_from_down(t, down, scal, k, weights)
    for _ in range(rounds):
        A, _ = _up_pass(t, down, k)
        old = t.blen.copy()
        cand = t.blen.copy()
        for v in range(len(t.children)):
            if v == t.root:
                continue
            a, b = _edge_ab(A[v], down[v], k)
            x = _optimize_x(a, b, k, _x_of(t.blen[v], k), weights)
            cand[v] = _blen_of_x(x, k)
        step = 1.0
        ll_new = None
        for _bt in range(8):
            t.blen = old + step * (cand - old)
            down, scal = _down_pass(t, leaf_part, k)
            ll = _loglik_from_down(t, down, scal, k, weights)
            if ll >= ll0 - 1e-9:
                ll_new = ll
                break
            step *= 0.5
        if ll_new is None:
            t.blen = old
            down, scal = _down_pass(t, leaf_part, k)
            break
        improved = ll_new > ll0 + 1e-9
        ll0 = max(ll_new, ll0)
        if not improved:
            break
    t.loglik = ll0
    return t


def _score_config(G, eD, eA, eB, xc, k, weights=None):
    """Log-score of topology ((A,B)c, D)p with rest-of-tree context G:
    combine A,B at c, pass through edge c (xc), join D and G at p."""
    mc = eA * eB
    mx = np.maximum(mc.max(axis=1), 1e-300)
    mc = mc / mx[:, None]
    mp = _pmul(mc, xc, k) * eD * G
    site = np.maximum(mp.sum(axis=1), 1e-300)
    site_log = np.log(site) + np.log(mx)
    if weights is None:
        return float(site_log.sum())
    return float(site_log @ weights)


def nni_round(t: MlTree, leaf_part, k: int, weights=None) -> int:
    """One NNI step: for each internal edge (p, c) with c internal,
    children(c) = {A, B} and sibling D at p, score the three topologies
    with fixed local messages (reference collect_nni_edges/apply_nni_swap,
    tree.rs:2404,2584). Messages go stale after any swap, so only the
    single best-scoring swap is applied per step and then verified with a
    full recompute (reverted if the global likelihood drops)."""
    down, scal = _down_pass(t, leaf_part, k)
    ll_before = _loglik_from_down(t, down, scal, k, weights)
    _, atnode = _up_pass(t, down, k)
    best_gain, best_move = 0.0, None
    for c in range(len(t.children)):
        p = int(t.parent[c])
        if p < 0 or not t.children[c] or len(t.children[c]) != 2:
            continue
        if len(t.children[p]) != 2:
            continue
        sibs = [s for s in t.children[p] if s != c]
        if len(sibs) != 1:
            continue
        D = sibs[0]
        A, B = t.children[c]
        eA = _pmul(down[A], _x_of(t.blen[A], k), k)
        eB = _pmul(down[B], _x_of(t.blen[B], k), k)
        eD = _pmul(down[D], _x_of(t.blen[D], k), k)
        G = atnode[p]
        xc = _x_of(t.blen[c], k)
        s0 = _score_config(G, eD, eA, eB, xc, k, weights)  # current
        s1 = _score_config(G, eB, eA, eD, xc, k, weights)  # swap B <-> D
        s2 = _score_config(G, eA, eB, eD, xc, k, weights)  # swap A <-> D
        if s1 - s0 > best_gain:
            best_gain, best_move = s1 - s0, (p, c, A, D, B, "B")
        if s2 - s0 > best_gain:
            best_gain, best_move = s2 - s0, (p, c, B, D, A, "A")
    if best_move is None or best_gain < 1e-9:
        return 0
    p, c, keep, D, out, _tag = best_move
    old_cc, old_pc = list(t.children[c]), list(t.children[p])
    t.children[c] = [keep, D]
    t.children[p] = [c, out]
    t.parent[D], t.parent[out] = c, p
    down, scal = _down_pass(t, leaf_part, k)
    if _loglik_from_down(t, down, scal, k, weights) <= ll_before:
        t.children[c], t.children[p] = old_cc, old_pc
        t.parent[D], t.parent[out] = p, c
        return 0
    return 1


def genotype_leaf_partials(codes: np.ndarray, site_budget: int = 2000,
                           seed: int = 0):
    """2-state (CFN) leaf partials from dosage codes (m, n): state 0 =
    ref-hom, state 1 = alt-hom, het/missing = ambiguous (ones).
    Subsamples sites to ``site_budget`` (reference site budget,
    tree.rs:1974)."""
    m, n = codes.shape
    if m > site_budget:
        rng = np.random.default_rng(seed)
        rows = np.sort(rng.choice(m, size=site_budget, replace=False))
        codes = codes[rows]
        m = site_budget
    parts = []
    ct = codes.T  # (n, m)
    for i in range(n):
        P = np.ones((m, 2))
        P[ct[i] == 0, 1] = 0.0
        P[ct[i] == 2, 0] = 0.0
        parts.append(P)
    return parts


def ml_refine_tree(
    newick: str,
    leaf_partials: list,
    leaf_names: list,
    k: int = 2,
    nni_rounds: int | None = None,
    bl_rounds: int = 2,
    weights=None,
) -> MlTree:
    """NJ topology -> approximate-ML tree: alternate verified single-swap
    NNI steps and monotone branch-length rounds until no swap improves.
    Default budget 4*n_leaves steps (one swap applied per step).
    ``weights``: per-site multiplicities (bootstrap resamples compose with
    -ml by reweighting instead of materializing resampled alignments)."""
    t = parse_newick(newick)
    if nni_rounds is None:
        nni_rounds = 4 * t.n_leaves
    name_to_part = dict(zip(leaf_names, leaf_partials))
    leaf_part = {}
    for v in range(len(t.children)):
        if not t.children[v]:
            if t.labels[v] not in name_to_part:
                raise ValueError(f"leaf {t.labels[v]!r} missing from alignment")
            leaf_part[v] = name_to_part[t.labels[v]]
    if weights is not None:
        weights = np.asarray(weights, np.float64).reshape(-1)
        n_sites = next(iter(leaf_part.values())).shape[0]
        if len(weights) != n_sites:
            raise ValueError(
                f"site weights length {len(weights)} != {n_sites} sites")
    t.blen = np.clip(t.blen, MIN_BLEN, MAX_BLEN)
    optimize_branch_lengths(t, leaf_part, k, rounds=bl_rounds,
                            weights=weights)
    for _ in range(nni_rounds):
        swaps = nni_round(t, leaf_part, k, weights=weights)
        optimize_branch_lengths(t, leaf_part, k, rounds=1, weights=weights)
        if swaps == 0:
            break
    return t


def ml_bootstrap_support(
    main_newick: str,
    leaf_partials: list,
    leaf_names: list,
    k: int = 2,
    n_boot: int = 100,
    seed: int = 0,
    nni_rounds: int | None = None,
) -> str:
    """Bootstrap support for an ML tree: each replicate draws multinomial
    SITE WEIGHTS and refines under the weighted likelihood (no resampled
    alignments materialized — the weighted `scal` accumulation makes -b
    compose with -ml, reference tree.rs bootstrap-with-ml)."""
    from janusx_tpu.models.tree import _tree_splits, annotate_split_support

    rng = np.random.default_rng(seed)
    m = leaf_partials[0].shape[0]
    counts: dict = {}
    for _ in range(int(n_boot)):
        w = rng.multinomial(m, np.full(m, 1.0 / m)).astype(np.float64)
        t = ml_refine_tree(main_newick, leaf_partials, leaf_names, k=k,
                           nni_rounds=nni_rounds, weights=w)
        for s in _tree_splits(to_newick(t)):
            counts[s] = counts.get(s, 0) + 1
    return annotate_split_support(main_newick, counts, n_boot)


def ml_tree(pg, site_budget: int | None = None, seed: int = 0,
            nni_rounds: int | None = None) -> tuple[str, float]:
    """Approximate-ML tree from packed genotypes: IBS-NJ start + CFN
    NNI/branch-length refinement. Returns (newick, loglik)."""
    from janusx_tpu import config
    from janusx_tpu.models.tree import nj_tree

    if site_budget is None:
        site_budget = config.knob("JX_TPU_ML_SITE_BUDGET")
    nwk = nj_tree(pg)
    parts = genotype_leaf_partials(pg.dosages(), site_budget, seed)
    t = ml_refine_tree(nwk, parts, [str(s) for s in pg.samples], k=2,
                       nni_rounds=nni_rounds)
    return to_newick(t), t.loglik
