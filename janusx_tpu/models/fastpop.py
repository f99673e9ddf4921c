"""FastPop / ADMIXTURE-style ancestry decomposition.

TPU-native re-design of the reference's adamixture engine
(/root/reference/src/stats/adamixture.rs: EM + Adam updates of P/Q over
streamed BED log-likelihood, RSVD init, CV error;
python/janusx/adamixture/core.py train_adamixture).

Model: binomial likelihood of dosages g_ij in {0,1,2}
    L = Σ_ij [ g_ij ln f_ij + (2 - g_ij) ln(1 - f_ij) ],  F = Q P
with Q (n, K) on the simplex per sample and P (K, m) in (0, 1).

Here the WHOLE optimization is one jitted Adam loop on device: Q rows are
softmax-parameterized, P sigmoid-parameterized, the loglik streams over
2-bit packed SNP blocks via lax.scan (missing genotypes contribute zero),
and gradients come from autodiff — replacing ~8.6k lines of hand-written
Rust update kernels.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from janusx_tpu import config
from janusx_tpu.io.packed import PackedGenotypes
from janusx_tpu.ops import decode
from janusx_tpu.utils import devcache

_EPS = 1e-6


@dataclass
class AdmixtureFit:
    Q: np.ndarray  # (n, K) ancestry fractions
    P: np.ndarray  # (K, m) allele frequencies
    loglik: float
    loglik_path: np.ndarray
    n_iter: int


def _block_loglik(params, pk, n: int):
    """Negative loglik contribution of one packed SNP block."""
    qlogit, plogit = params
    Q = jax.nn.softmax(qlogit, axis=1)  # (n, K)
    codes = decode.unpack_codes(pk)[:, :n]  # (B, n)
    g = codes.astype(jnp.float32)
    mask = (codes != 3).astype(jnp.float32)
    Pb = jax.nn.sigmoid(plogit)  # (B, K)
    F = jnp.clip(
        jnp.dot(Pb, Q.T, precision=jax.lax.Precision.HIGHEST), _EPS, 1.0 - _EPS
    )  # (B, n)
    ll = mask * (g * jnp.log(F) + (2.0 - g) * jnp.log1p(-F))
    return -jnp.sum(ll)


@partial(jax.jit, static_argnames=("n", "block", "n_iter", "lr", "tol",
                                   "check_every"))
def _train(qlogit0, plogit0, packed, n: int, block: int, n_iter: int,
           lr: float, tol: float = 0.0, check_every: int = 0):
    nblk = packed.shape[0] // block
    pk = packed.reshape(nblk, block, packed.shape[1])

    def loss_fn(qlogit, plogit):
        def body(acc, xs):
            pkb, plb = xs
            return acc + _block_loglik((qlogit, plb), pkb, n), None

        pl = plogit.reshape(nblk, block, -1)
        total, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), (pk, pl))
        return total

    # Adam state
    def adam_update(g, m_, v_, t):
        b1, b2, eps = 0.9, 0.999, 1e-8
        m_ = b1 * m_ + (1 - b1) * g
        v_ = b2 * v_ + (1 - b2) * g * g
        mhat = m_ / (1 - b1**t)
        vhat = v_ / (1 - b2**t)
        return mhat / (jnp.sqrt(vhat) + eps), m_, v_

    def step(state):
        i, ql, pl, mq, vq, mp, vp, lls, last_ll, done = state
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(ql, pl)
        gq, gp = grads
        t = (i + 1).astype(jnp.float32)
        dq, mq, vq = adam_update(gq, mq, vq, t)
        dp, mp, vp = adam_update(gp, mp, vp, t)
        ql = ql - lr * dq
        pl = pl - lr * dp
        ll = -loss
        lls = lls.at[i].set(ll)
        if check_every > 0:
            # reference -check/-tol: test relative log-likelihood
            # improvement every check_every iterations, stop when < tol
            do_check = ((i + 1) % check_every) == 0
            rel = jnp.abs(ll - last_ll) / (jnp.abs(last_ll) + 1.0)
            done = do_check & (i + 1 >= 2 * check_every) & (rel < tol)
            last_ll = jnp.where(do_check, ll, last_ll)
        return i + 1, ql, pl, mq, vq, mp, vp, lls, last_ll, done

    def cond(state):
        i, *_, done = state
        return (i < n_iter) & (~done)

    z = lambda x: jnp.zeros_like(x)
    state0 = (
        jnp.asarray(0, jnp.int32),
        qlogit0, plogit0, z(qlogit0), z(qlogit0), z(plogit0), z(plogit0),
        jnp.zeros((n_iter,), jnp.float32),
        jnp.asarray(-jnp.inf, jnp.float32), jnp.asarray(False),
    )
    n_done, ql, pl, *_, lls, _last, _done = jax.lax.while_loop(
        cond, step, state0)
    return ql, pl, lls, n_done


def train_admixture(
    pg: PackedGenotypes,
    n_pops: int,
    n_iter: int = 300,
    lr: float = 0.05,
    block: int = config.DEFAULT_SNP_BLOCK,
    seed: int = 0,
    rsvd_init: bool = True,
    tol: float = 0.0,
    check_every: int = 0,
) -> AdmixtureFit:
    n, m, K = pg.n, pg.m, int(n_pops)
    if K < 2:
        raise ValueError("n_pops must be >= 2")
    rng = np.random.default_rng(seed)
    block = min(block, m)
    m_pad = -(-m // block) * block
    pk = devcache.device_packed(pg, m_pad)

    # init: RSVD PCs -> kmeans-ish soft assignment, P from af
    qlogit0 = rng.normal(0, 0.1, size=(n, K)).astype(np.float32)
    if rsvd_init and K > 1:
        try:
            from janusx_tpu.models.pca import rsvd_pca

            _, pcs = rsvd_pca(pg, n_pc=min(K - 1, 8), block=block)
            # soft clusters from quantile splits of PC1..; simple + stable
            z = (pcs - pcs.mean(0)) / (pcs.std(0) + 1e-9)
            centers = z[rng.choice(n, K, replace=False)]
            d2 = ((z[:, None, :] - centers[None]) ** 2).sum(-1)
            qlogit0 = (-0.5 * d2).astype(np.float32)
        except Exception:
            pass
    af = np.clip(pg.af, 0.02, 0.98)
    p0 = np.clip(
        af[:, None] + rng.normal(0, 0.05, size=(m, K)), 0.02, 0.98
    )
    plogit0 = np.log(p0 / (1 - p0)).astype(np.float32)
    plogit0 = np.concatenate(
        [plogit0, np.zeros((m_pad - m, K), np.float32)], axis=0
    )

    ql, pl, lls, n_done = _train(
        jnp.asarray(qlogit0), jnp.asarray(plogit0), pk, n, block, n_iter, lr,
        tol=float(tol), check_every=int(check_every),
    )
    Q = np.asarray(jax.nn.softmax(ql, axis=1), np.float64)
    P = np.asarray(jax.nn.sigmoid(pl), np.float64)[:m].T
    n_done = int(n_done)
    lls = np.asarray(lls, np.float64)[:n_done]
    return AdmixtureFit(
        Q=Q, P=P, loglik=float(lls[-1]) if n_done else float("nan"),
        loglik_path=lls, n_iter=n_done,
    )


def cv_error(
    pg: PackedGenotypes,
    n_pops: int,
    holdout_frac: float = 0.1,
    seed: int = 0,
    **kwargs,
) -> float:
    """ADMIXTURE-style CV: mask a random subset of genotype cells, fit, and
    measure binomial deviance on the held-out cells (host evaluation)."""
    rng = np.random.default_rng(seed)
    d = pg.dosages().astype(np.float64)
    obs = d >= 0
    hold = obs & (rng.random(d.shape) < holdout_frac)
    codes = d.copy()
    codes[hold] = -1
    from janusx_tpu.io.gdata import GenotypeData
    from janusx_tpu.io.packed import QcParams, pack_genotypes

    gd = GenotypeData(codes.astype(np.int8), pg.sites, pg.samples)
    pg_masked = pack_genotypes(gd, QcParams(maf=0.0, geno=1.0))
    if pg_masked.m != pg.m:
        raise RuntimeError("cv mask unexpectedly dropped SNP rows")
    fit = train_admixture(pg_masked, n_pops, seed=seed, **kwargs)
    F = np.clip(fit.P.T @ fit.Q.T, 1e-6, 1 - 1e-6)  # (m, n)
    # masking can push alt_freq past 0.5, so the re-pack may flip rows:
    # the fitted frequency then models 2-g; map back to pg's coding
    flipped = pg_masked.sites.allele1 != pg.sites.allele1
    F[flipped] = 1.0 - F[flipped]
    g = d[hold]
    f = F[hold]
    dev = -np.mean(g * np.log(f) + (2 - g) * np.log1p(-f))
    return float(dev)


def write_admixture_outputs(prefix: str, samples, fit: AdmixtureFit) -> None:
    K = fit.Q.shape[1]
    with open(f"{prefix}.{K}.Q", "wt") as fh:
        for i, s in enumerate(samples):
            fh.write(" ".join(f"{v:.6f}" for v in fit.Q[i]) + "\n")
    with open(f"{prefix}.{K}.P", "wt") as fh:
        for j in range(fit.P.shape[1]):
            fh.write(" ".join(f"{fit.P[k, j]:.6f}" for k in range(K)) + "\n")
