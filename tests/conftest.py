"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual CPU mesh (the driver
separately dry-runs the multi-chip path); numeric tests run fine on CPU.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize imports jax before this file runs, so the
# JAX_PLATFORMS env var is already frozen — override via config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped on purpose: a session-scoped stream makes every
    # downstream dataset depend on which tests ran before (draw-order
    # coupling), which turned borderline statistical assertions into
    # order-dependent flakes
    return np.random.default_rng(20260816)


@pytest.fixture(scope="session")
def mouse_vcf():
    path = "/root/reference/example/mouse_hs1940.vcf.gz"
    if not os.path.exists(path):
        pytest.skip("mouse_hs1940 example not available")
    return path


@pytest.fixture(scope="session")
def mouse_pheno():
    path = "/root/reference/example/mouse_hs1940.pheno"
    if not os.path.exists(path):
        pytest.skip("mouse_hs1940 example not available")
    return path


def simulate_genotypes(rng, m=500, n=200, maf_low=0.05, missing_rate=0.02):
    """Small random dosage matrix with missingness for unit tests."""
    p = rng.uniform(maf_low, 0.5, size=m)
    g = rng.binomial(2, p[:, None], size=(m, n)).astype(np.int8)
    miss = rng.random((m, n)) < missing_rate
    g[miss] = -1
    return g


@pytest.fixture
def toy_genotypes(rng):
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo

    m, n = 300, 120
    g = simulate_genotypes(rng, m, n)
    sites = SiteInfo(
        chrom=np.array(["1"] * (m // 2) + ["2"] * (m - m // 2), object),
        pos=np.arange(1, m + 1, dtype=np.int64) * 100,
        snp=np.array([f"rs{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )
    samples = np.array([f"ind{i}" for i in range(n)], object)
    return GenotypeData(g, sites, samples)
