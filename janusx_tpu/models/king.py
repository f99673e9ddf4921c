"""KING-robust relatedness and unrelated-set pruning.

Replaces the reference's KING module (/root/reference/src/math/KING.rs:
KING-robust estimates from bitplanes, related-pair graph, unrelated-set
pruning).

KING-robust estimator between samples i, j over jointly observed sites:

    φ_ij = (N_het,het − 2·N_opposing_hom) / (N_het_i + N_het_j)

All pair counts are indicator matmuls on device (het/hom planes, one
(n, m) x (m, n) product each), exactly like the IBS distance kernel.
Default relatedness threshold 0.0884 (2nd-degree cutoff).
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

DEGREE2_THRESHOLD = 0.0884  # kinship > 2^-3.5 -> 2nd degree or closer


@partial(jax.jit, static_argnames=("block",))
def _king_counts(packed, block: int):
    nblk = packed.shape[0] // block
    pk = packed.reshape(nblk, block, packed.shape[1])
    hp = jax.lax.Precision.HIGHEST

    def body(carry, pkb):
        hh, opp, het_shared_i, obs2 = carry
        codes = decode.unpack_codes(pkb)
        obs = (codes != 3).astype(jnp.float32)
        h = (codes == 1).astype(jnp.float32)
        a0 = (codes == 0).astype(jnp.float32)
        a2 = (codes == 2).astype(jnp.float32)
        hh = hh + jnp.dot(h.T, h, precision=hp)
        o = jnp.dot(a0.T, a2, precision=hp)
        opp = opp + o + o.T
        # het count of sample i over sites observed in j
        het_shared_i = het_shared_i + jnp.dot(h.T, obs, precision=hp)
        obs2 = obs2 + jnp.dot(obs.T, obs, precision=hp)
        return (hh, opp, het_shared_i, obs2), None

    n_pad = packed.shape[1] * 4
    z = jnp.zeros((n_pad, n_pad), jnp.float32)
    (hh, opp, hsi, obs2), _ = jax.lax.scan(body, (z, z, z, z), pk)
    return hh, opp, hsi, obs2


def king_kinship(pg: PackedGenotypes, block: int = config.DEFAULT_SNP_BLOCK):
    """(n, n) KING-robust kinship matrix (diagonal set to 0.5)."""
    m = pg.m
    block = min(block, m)
    m_pad = -(-m // block) * block
    pk = devcache.device_packed(pg, m_pad)
    hh, opp, hsi, obs2 = _king_counts(pk, block)
    n = pg.n
    hh = np.asarray(hh, np.float64)[:n, :n]
    opp = np.asarray(opp, np.float64)[:n, :n]
    hsi = np.asarray(hsi, np.float64)[:n, :n]
    denom = hsi + hsi.T
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.where(denom > 0, (hh - 2.0 * opp) / denom, 0.0)
    np.fill_diagonal(phi, 0.5)
    return phi


def unrelated_set(
    phi: np.ndarray, threshold: float = DEGREE2_THRESHOLD
) -> np.ndarray:
    """Greedy max-independent-set pruning: repeatedly drop the sample with
    the most relatives above threshold (reference king_unrelated_set)."""
    n = phi.shape[0]
    adj = (phi > threshold).astype(np.int64)
    np.fill_diagonal(adj, 0)
    alive = np.ones(n, dtype=bool)
    deg = adj.sum(axis=1)
    while True:
        deg_alive = np.where(alive, deg, -1)
        worst = int(np.argmax(deg_alive))
        if deg_alive[worst] <= 0:
            break
        alive[worst] = False
        deg = deg - adj[:, worst]
    return np.nonzero(alive)[0]
