"""janusx-tpu: TPU-native GWAS + genomic-selection framework.

A from-scratch JAX/XLA/Pallas re-design of the JanusX capability stack
(GWAS scans: lm/lmm/lmm2/fvlmm/splmm/farmcpu; GS: GBLUP/rrBLUP/Bayes/ML;
GRM/PCA/popgen utilities) for TPU hardware: SNP-major genotype blocks as
2-bit packed buffers decoded on device, GRM and scan inner loops as MXU
matmuls, per-SNP variance-component optimization as lockstep batched Brent,
and multi-chip scaling via jax.sharding meshes with psum/all-gather over ICI.
"""

from __future__ import annotations

from janusx_tpu import config as _config

import os as _os

import jax as _jax

if _config.ENABLE_X64:
    _jax.config.update("jax_enable_x64", True)

# JX_TPU_PLATFORM wins over the ambient JAX_PLATFORMS even when jax was
# already imported by site hooks (e.g. remote-TPU relay environments pin
# JAX_PLATFORMS before user code runs).
_platform = _config.knob("JX_TPU_PLATFORM")
if _platform:
    _jax.config.update("jax_platforms", _platform)

# Persistent XLA compilation cache: kernel shapes recur across runs and
# first-compiles dominate short analyses (especially through remote-TPU
# tunnels). Opt out with JX_TPU_COMPILE_CACHE=0 or point it elsewhere.
_cache = _os.environ.get("JX_TPU_COMPILE_CACHE", "~/.cache/janusx_tpu_xla")
if _cache and _cache != "0":
    _jax.config.update("jax_compilation_cache_dir", _os.path.expanduser(_cache))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

__version__ = "0.1.0"

from janusx_tpu.io.gdata import GenotypeData, SiteInfo  # noqa: E402
from janusx_tpu.io.packed import PackedGenotypes  # noqa: E402

__all__ = [
    "GenotypeData",
    "SiteInfo",
    "PackedGenotypes",
    "__version__",
]
