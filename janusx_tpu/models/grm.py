"""Genomic relationship matrix build, TPU-blocked.

Replaces the reference's streamed Rust GRM (/root/reference/src/stats/grm.rs:
block decode -> cblas_dsyrk accumulate) with jit-compiled blocked matmuls:
for each SNP block the packed 2-bit buffer is decoded on device to a
centered (method 1) or standardized (method 2) f32 block C (B, n_pad) and
K_acc += C^T C runs on the MXU; the accumulator is carried in f64 across
blocks (matmul f32-HIGHEST, accumulate f64 — mirrors the reference's
f32-block/f64-accumulate split).

Definitions (reference src/stats/spgrm.rs:8-22):
  method 1 (cGRM): K = sum_j x_j x_j' / sum_j 2 p_j (1-p_j),  x = g - 2p
  method 2 (sGRM): K = sum_j z_j z_j' / m,  z = x / sqrt(2p(1-p))

Multi-chip: SNP blocks are sharded across the mesh with shard_map; each
device accumulates its local partial K and a single psum over ICI merges
them (see janusx_tpu.parallel.mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from janusx_tpu import config
from janusx_tpu.io.packed import PackedGenotypes
from janusx_tpu.ops import decode


def _snp_scales(pg: PackedGenotypes, method: int):
    """Per-SNP (mean, inv_sd) with monomorphic guard."""
    p = pg.af
    var = 2.0 * p * (1.0 - p)
    if method == 1:
        inv_sd = np.ones_like(var)
    else:
        with np.errstate(divide="ignore"):
            inv_sd = np.where(var > 0, 1.0 / np.sqrt(var), 0.0)
    return pg.mean, inv_sd, var


@partial(jax.jit, donate_argnums=(0,))
def _grm_accum_step(acc, packed, mean, inv_sd):
    c = decode.decode_standardized(packed, mean, inv_sd, dtype=jnp.float32)
    part = jnp.dot(c.T, c, precision=jax.lax.Precision.HIGHEST)
    return acc + part.astype(acc.dtype)


def grm_from_packed(
    pg: PackedGenotypes,
    method: int = 1,
    block: int = config.DEFAULT_SNP_BLOCK,
    dtype=np.float64,
) -> np.ndarray:
    """Build the dense (n, n) GRM from packed genotypes, streaming SNP blocks.

    Returns float64 host array.
    """
    mean, inv_sd, var = _snp_scales(pg, method)
    n = pg.n_samples
    packed = decode.pad_packed_cols(pg.packed)
    n_pad = packed.shape[1] * 4
    acc = jnp.zeros((n_pad, n_pad), dtype=jnp.float64 if dtype == np.float64 else jnp.float32)
    m = pg.m
    for s in range(0, m, block):
        e = min(s + block, m)
        acc = _grm_accum_step(
            acc,
            jnp.asarray(packed[s:e]),
            jnp.asarray(mean[s:e], dtype=jnp.float32),
            jnp.asarray(inv_sd[s:e], dtype=jnp.float32),
        )
    K = np.asarray(acc[:n, :n], dtype=np.float64)
    denom = float(var.sum()) if method == 1 else float(m)
    if denom <= 0:
        raise ValueError("GRM denominator is zero (no polymorphic SNPs?)")
    return K / denom


def grm_denominator(pg: PackedGenotypes, method: int = 1) -> float:
    var = 2.0 * pg.af * (1.0 - pg.af)
    return float(var.sum()) if method == 1 else float(pg.m)
