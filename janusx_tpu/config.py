"""Global configuration for janusx-tpu.

Precision policy (mirrors the reference's split of f32 genotype blocks with
f64 likelihood scalars, /root/reference/src/stats/lmm.rs + reml.rs):

- Genotype block matmuls (rotation, GRM accumulation, scan Gram assembly)
  run in float32 on the MXU.
- Log-likelihood scalars (REML/ML objectives, beta/se solves) run in float64
  when ``jax_enable_x64`` is active (the default here), matching the
  reference to ~1e-12; set ``JX_TPU_X64=0`` to run everything in f32
  (faster on TPU, -log10(p) parity to ~1e-3).

Environment knobs use the ``JX_`` prefix for familiarity with the reference
CLI (reference: ~60 JX_* expert env vars, SURVEY.md §5).
"""

from __future__ import annotations

import os


def _env_flag(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() not in ("0", "false", "off", "no", "")


# Must be consulted before the first jax import in janusx_tpu/__init__.py.
ENABLE_X64: bool = _env_flag("JX_TPU_X64", True)

# Default SNP-block size for streamed device kernels (rows of the SNP-major
# matrix processed per jit step). Aligned to MXU tiling (multiple of 128).
DEFAULT_SNP_BLOCK: int = int(os.environ.get("JX_TPU_SNP_BLOCK", "2048"))

# Default sample-axis padding multiple (lane alignment).
SAMPLE_ALIGN: int = 128

# QC defaults — reference: python/janusx/assoc/config.py:55-57.
DEFAULT_MAF: float = 0.02
DEFAULT_GENO: float = 0.05  # max missing rate
DEFAULT_HET: float = 1.0  # disabled by default

# λ search space, log10 scale — reference: python/janusx/pyBLUP/assoc.py:1808.
LOG10_LAMBDA_LOW: float = -5.0
LOG10_LAMBDA_HIGH: float = 5.0

# Brent defaults — reference: src/stats/lmm.rs:334 (scan), src/stats/reml.rs:650 (null).
SCAN_BRENT_MAX_ITER: int = 50
SCAN_BRENT_TOL: float = 1e-2
NULL_BRENT_MAX_ITER: int = 100
NULL_BRENT_TOL: float = 1e-6

# Ridge added to X'V^-1 X diagonal — reference: src/stats/reml.rs:316.
GRAM_RIDGE: float = 1e-6

# Cache directory override (reference: JANUSX_CACHE_DIR, gfreader.py:348).
CACHE_DIR_ENV: str = "JANUSX_CACHE_DIR"


def cache_dir_override() -> str | None:
    return os.environ.get(CACHE_DIR_ENV) or None
