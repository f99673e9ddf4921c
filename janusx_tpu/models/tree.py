"""Neighbor-joining phylogeny from genotypes.

Replaces the reference's tree module (/root/reference/src/stats/tree.rs:
NJ + approximate-ML Newick trees from genotype alignments).

Distance: allele-sharing (IBS) distance d_ij = mean(|g_i - g_j|) / 2 over
jointly observed sites. TPU mapping: |g_i - g_j| decomposes over genotype
indicator classes, so the whole distance matrix is SIX (n, m) x (m, n)
MXU matmuls of 0/1 indicators streamed over packed SNP blocks; the O(n³)
NJ agglomeration runs on host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from janusx_tpu import config
from janusx_tpu.io.packed import PackedGenotypes
from janusx_tpu.ops import decode
from janusx_tpu.utils import devcache


@partial(jax.jit, static_argnames=("block",))
def _ibs_accumulate(packed, block: int):
    """Returns (sum|gi-gj| (n_pad, n_pad), n_obs_pairs (n_pad, n_pad))."""
    nblk = packed.shape[0] // block
    pk = packed.reshape(nblk, block, packed.shape[1])
    hp = jax.lax.Precision.HIGHEST

    def body(carry, pkb):
        acc_d, acc_n = carry
        codes = decode.unpack_codes(pkb)  # (B, n_pad)
        obs = (codes != 3).astype(jnp.float32)
        a0 = (codes == 0).astype(jnp.float32)
        a1 = (codes == 1).astype(jnp.float32)
        a2 = (codes == 2).astype(jnp.float32)
        # |gi-gj| = 1*(cross 0-1 and 1-2) + 2*(cross 0-2)
        m01 = jnp.dot(a0.T, a1, precision=hp)
        m12 = jnp.dot(a1.T, a2, precision=hp)
        m02 = jnp.dot(a0.T, a2, precision=hp)
        d = (m01 + m01.T) + (m12 + m12.T) + 2.0 * (m02 + m02.T)
        nn = jnp.dot(obs.T, obs, precision=hp)
        return (acc_d + d, acc_n + nn), None

    n_pad = packed.shape[1] * 4
    z = jnp.zeros((n_pad, n_pad), jnp.float32)
    (acc_d, acc_n), _ = jax.lax.scan(body, (z, z), pk)
    return acc_d, acc_n


def ibs_distance(pg: PackedGenotypes, block: int = config.DEFAULT_SNP_BLOCK):
    m = pg.m
    block = min(block, m)
    m_pad = -(-m // block) * block
    pk = devcache.device_packed(pg, m_pad)
    d, nn = _ibs_accumulate(pk, block)
    n = pg.n
    d = np.asarray(d, np.float64)[:n, :n]
    nn = np.asarray(nn, np.float64)[:n, :n]
    with np.errstate(divide="ignore", invalid="ignore"):
        D = np.where(nn > 0, d / nn, 0.0) / 2.0
    np.fill_diagonal(D, 0.0)
    return D


def neighbor_joining(D: np.ndarray, labels) -> str:
    """Classic NJ (Saitou & Nei) -> Newick string."""
    D = np.asarray(D, np.float64).copy()
    n = D.shape[0]
    labels = [str(l) for l in labels]
    nodes = list(range(n))
    newick = {i: labels[i] for i in range(n)}
    active = list(range(n))
    Dw = D
    while len(active) > 2:
        r = len(active)
        sub = Dw[np.ix_(active, active)]
        rowsum = sub.sum(axis=1)
        Q = (r - 2) * sub - rowsum[:, None] - rowsum[None, :]
        np.fill_diagonal(Q, np.inf)
        i_loc, j_loc = np.unravel_index(np.argmin(Q), Q.shape)
        if i_loc > j_loc:
            i_loc, j_loc = j_loc, i_loc
        i, j = active[i_loc], active[j_loc]
        dij = sub[i_loc, j_loc]
        li = 0.5 * dij + (rowsum[i_loc] - rowsum[j_loc]) / (2 * (r - 2))
        lj = dij - li
        li, lj = max(li, 0.0), max(lj, 0.0)
        # new node
        k = Dw.shape[0]
        newrow = 0.5 * (
            Dw[i, :] + Dw[j, :] - dij
        )
        Dw = np.pad(Dw, ((0, 1), (0, 1)))
        Dw[k, : k] = newrow
        Dw[: k, k] = newrow
        Dw[k, k] = 0.0
        newick[k] = f"({newick[i]}:{li:.6g},{newick[j]}:{lj:.6g})"
        active = [a for a in active if a not in (i, j)] + [k]
    i, j = active
    d = max(Dw[i, j], 0.0)
    return f"({newick[i]}:{d / 2:.6g},{newick[j]}:{d / 2:.6g});"


def nj_tree(pg: PackedGenotypes, block: int = config.DEFAULT_SNP_BLOCK) -> str:
    D = ibs_distance(pg, block)
    return neighbor_joining(D, pg.samples)
