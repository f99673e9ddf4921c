"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that SNP-sharded execution produces the same numbers as
single-device execution and that the GRM partial-product psum pattern is
correct — the driver's dryrun_multichip covers compile/execute, these
cover numerics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from janusx_tpu.io import bitcodec
from janusx_tpu.ops import decode
from janusx_tpu.parallel.mesh import make_mesh, pad_to_multiple


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_sharded_grm_matches_single_device(mesh8, rng):
    m, n = 256, 96
    codes = rng.integers(0, 3, size=(m, n)).astype(np.uint8)
    packed = decode.pad_packed_cols(bitcodec.pack_codes(codes))
    mean = codes.mean(axis=1).astype(np.float32)

    def kfn(pk, mn):
        c = decode.decode_centered(pk, mn, dtype=jnp.float32)
        return jnp.dot(c.T, c, precision=jax.lax.Precision.HIGHEST)

    # single device
    K1 = np.asarray(jax.jit(kfn)(packed, mean))
    # SNP-sharded: contraction over the sharded axis -> XLA inserts psum
    shard2 = NamedSharding(mesh8, P("snp", None))
    shard1 = NamedSharding(mesh8, P("snp"))
    pk_s = jax.device_put(packed, shard2)
    mn_s = jax.device_put(mean, shard1)
    K8 = np.asarray(jax.jit(kfn)(pk_s, mn_s))
    np.testing.assert_allclose(K8, K1, rtol=1e-5, atol=1e-5)


def test_sharded_lmm_scan_matches_single_device(mesh8):
    from janusx_tpu.core.reml import (
        beta_se_snp_batch,
        grid_shared,
        lmm_grid_scan_with,
        make_rotated,
    )
    from janusx_tpu.core.spectral import eigh_grm

    rng = np.random.default_rng(2)
    m, n = 64, 80
    G = rng.binomial(2, 0.3, size=(m, n)).astype(np.float64)
    Gc = G - G.mean(axis=1, keepdims=True)
    K = Gc.T @ Gc / m
    basis = eigh_grm(K, diag_ridge=1e-6)
    y = rng.normal(size=n)
    rot = make_rotated(basis, y, None)
    grid = jnp.asarray(np.linspace(-5, 5, 256))
    Gr_host = (Gc @ basis.U).astype(np.float64)

    def scan_fn(Gr):
        sh = grid_shared(rot, grid)
        lgs = lmm_grid_scan_with(sh, rot, Gr)
        beta, se = beta_se_snp_batch(lgs, rot, Gr)
        return lgs, beta, se

    l1, b1, s1 = jax.jit(scan_fn)(jnp.asarray(Gr_host))
    Gr_sharded = jax.device_put(Gr_host, NamedSharding(mesh8, P("snp", None)))
    l8, b8, s8 = jax.jit(scan_fn)(Gr_sharded)
    # the stacked grid matmul's f32 reduction tiling depends on the local
    # batch size, so sharded lanes agree at f32-gram noise (project parity
    # tolerance), not bitwise; λ* may shift by at most ~one grid spacing
    # on near-tie cells
    np.testing.assert_allclose(np.asarray(b8), np.asarray(b1), rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1), rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l8), np.asarray(l1), atol=0.05)


def test_pad_to_multiple():
    x = np.arange(10)
    assert pad_to_multiple(x, 8).shape[0] == 16
    assert pad_to_multiple(x, 5).shape[0] == 10


# ---------------------------------------------------------------------------
# PRODUCTION-path sharding: the real model entry points with mesh=...
# ---------------------------------------------------------------------------
def _toy_pg(rng, m=500, n=96):
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.io.packed import QcParams, pack_genotypes

    g = rng.binomial(2, rng.uniform(0.05, 0.5, size=(m, 1)), size=(m, n)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(m, dtype=np.int64) + 1,
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )
    gd = GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object))
    return pack_genotypes(gd, QcParams(maf=0.01))


def test_production_grm_sharded(mesh8, rng):
    from janusx_tpu.models.grm import grm_from_packed

    pg = _toy_pg(rng)
    # f32 partial products flush in different groupings across devices, so
    # agreement is at f32 rounding level (the f64 outer accumulate keeps
    # the error from growing with m)
    K1 = grm_from_packed(pg, method=1, block=64)
    K8 = grm_from_packed(pg, method=1, block=64, mesh=mesh8)
    np.testing.assert_allclose(K8, K1, rtol=2e-3, atol=1e-6)
    S1 = grm_from_packed(pg, method=2, block=64)
    S8 = grm_from_packed(pg, method=2, block=64, mesh=mesh8)
    np.testing.assert_allclose(S8, S1, rtol=2e-3, atol=1e-6)


def test_production_scans_sharded(mesh8, rng):
    from janusx_tpu.core.spectral import eigh_grm
    from janusx_tpu.models.fvlmm import fvlmm_scan
    from janusx_tpu.models.grm import grm_from_packed
    from janusx_tpu.models.lm import lm_scan
    from janusx_tpu.models.lmm import lmm_scan
    from janusx_tpu.utils import devcache

    pg = _toy_pg(rng)
    n = pg.n
    K = grm_from_packed(pg, block=64)
    basis = eigh_grm(K, diag_ridge=1e-6)
    y = rng.normal(size=n) + pg.centered()[3] * 0.4

    def close(a, b):
        # f32 MXU grams reduce in different tilings across devices, so
        # agreement is at f32-gram noise level; -log10 p within the
        # project's 5e-3 parity tolerance
        np.testing.assert_allclose(b.beta, a.beta, rtol=2e-3, atol=1e-6, equal_nan=True)
        dlogp = np.abs(np.log10(b.pwald) - np.log10(a.pwald))
        assert np.nanmax(dlogp) < 5e-3

    r1 = lm_scan(pg, y, block=64)
    r8 = lm_scan(pg, y, block=64, mesh=mesh8)
    close(r1, r8)

    f1, _ = fvlmm_scan(pg, basis, y, block=64)
    f8, _ = fvlmm_scan(pg, basis, y, block=64, mesh=mesh8)
    close(f1, f8)

    l1, n1 = lmm_scan(pg, basis, y, block=64, use_pallas=False)
    l8, n8 = lmm_scan(pg, basis, y, block=64, use_pallas=False, mesh=mesh8)
    assert n1.lbd == n8.lbd
    close(l1, l8)

    # the uploaded packed buffer really spans all 8 devices
    sharded = [
        v for v in devcache._cache.values()
        if hasattr(v, "sharding") and getattr(v.sharding, "num_devices", 1) == 8
    ]
    assert sharded, "no device-cache entry is sharded across the mesh"


def test_run_gwas_sharded_matches_single(tmp_path):
    """The actual run_gwas entry on the 8-device mesh vs single device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from janusx_tpu.io.plink import write_plink
    from janusx_tpu.workflows.gwas import GwasConfig, run_gwas

    rng = np.random.default_rng(42)
    pg = _toy_pg(rng, m=300, n=80)
    # materialize as PLINK + pheno
    geno = str(tmp_path / "toy")
    write_plink(geno, pg.packed, pg.n_samples, pg.sites, pg.samples)
    y = rng.normal(size=pg.n) + pg.centered()[7] * 0.6
    with open(tmp_path / "toy.pheno", "wt") as fh:
        fh.write("id\tt1\n")
        for s, v in zip(pg.samples, y):
            fh.write(f"{s}\t{v:.6f}\n")

    common = dict(
        genotype=geno + ".bed", phenotype=str(tmp_path / "toy.pheno"),
        models=("lmm",), force_model=True, block=64, use_cache=False,
    )
    res1 = run_gwas(GwasConfig(out_prefix=str(tmp_path / "o1"), n_devices=1, **common))
    res8 = run_gwas(GwasConfig(out_prefix=str(tmp_path / "o8"), n_devices=8, **common))
    a, b = res1[0].result, res8[0].result
    # the sharded run builds a (f32-rounding-level) different GRM, so the
    # basis and per-SNP lambda differ slightly; p-parity is the contract
    np.testing.assert_allclose(b.beta, a.beta, rtol=2e-3, atol=1e-5, equal_nan=True)
    dlogp = np.abs(np.log10(b.pwald) - np.log10(a.pwald))
    assert np.nanmax(dlogp) < 5e-3

    # biobank route: the GRAMMAR-gamma scan's per-SNP grams are SNP-sharded
    common["models"] = ("splmm",)
    sp1 = run_gwas(GwasConfig(out_prefix=str(tmp_path / "s1"), n_devices=1, **common))
    sp8 = run_gwas(GwasConfig(out_prefix=str(tmp_path / "s8"), n_devices=8, **common))
    a, b = sp1[0].result, sp8[0].result
    np.testing.assert_allclose(b.beta, a.beta, rtol=2e-3, atol=1e-5, equal_nan=True)
    dlogp = np.abs(np.log10(b.pwald) - np.log10(a.pwald))
    assert np.nanmax(dlogp) < 5e-3


def test_run_gwas_sharded_multilocus_routes(tmp_path):
    """8-way-vs-single run_gwas numerics for the remaining scan routes:
    -farmcpu, -frgwas, -algwas, -lowrank (their inner scans now take the
    mesh — reference analog: these kernels run under the same full
    rayon/BLAS thread plan as the flagship scan, src/stats/farmcpu.rs)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from janusx_tpu.io.plink import write_plink
    from janusx_tpu.workflows.gwas import GwasConfig, run_gwas

    rng = np.random.default_rng(11)
    pg = _toy_pg(rng, m=400, n=100)
    geno = str(tmp_path / "toy")
    write_plink(geno, pg.packed, pg.n_samples, pg.sites, pg.samples)
    # two strong planted QTNs so the multi-locus selection is stable
    # under f32-gram noise between the sharded and single runs
    Z = pg.centered()
    y = 1.2 * Z[60] + 1.0 * Z[250] + rng.normal(size=pg.n) * 0.6
    with open(tmp_path / "toy.pheno", "wt") as fh:
        fh.write("id\tt1\n")
        for s, v in zip(pg.samples, y):
            fh.write(f"{s}\t{v:.6f}\n")

    cov = rng.normal(size=(pg.n, 1))
    covf = str(tmp_path / "toy.cov")
    with open(covf, "wt") as fh:
        fh.write("id\tc1\n")
        for s, v in zip(pg.samples, cov[:, 0]):
            fh.write(f"{s}\t{v:.6f}\n")

    for model in ("farmcpu", "frgwas", "algwas", "lowrank", "splmm-exact",
                  "lm2", "fvlmm2"):
        common = dict(
            genotype=geno + ".bed", phenotype=str(tmp_path / "toy.pheno"),
            models=(model,), force_model=True, block=64, use_cache=False,
            lowrank_snps=128,
        )
        if model in ("lm2", "fvlmm2"):
            common["covariates"] = covf
        r1 = run_gwas(GwasConfig(
            out_prefix=str(tmp_path / f"{model}1"), n_devices=1, **common))
        r8 = run_gwas(GwasConfig(
            out_prefix=str(tmp_path / f"{model}8"), n_devices=8, **common))
        a, b = r1[0].result, r8[0].result
        np.testing.assert_allclose(
            b.beta, a.beta, rtol=2e-3, atol=1e-5, equal_nan=True,
            err_msg=model,
        )
        ok = np.isfinite(a.pwald) & np.isfinite(b.pwald) & (a.pwald > 0)
        dlogp = np.abs(np.log10(b.pwald[ok]) - np.log10(a.pwald[ok]))
        assert np.nanmax(dlogp) < 5e-3, model


def test_run_gs_sharded_matches_single(tmp_path, rng):
    """run_gs on the 8-way mesh == single-device (GBLUP CV + gebv)."""
    import json

    from janusx_tpu.gs.workflow import GsConfig, run_gs
    from janusx_tpu.io import plink
    from janusx_tpu.models.sim import simulate_genotypes, simulate_phenotype, write_pheno

    gd = simulate_genotypes(120, 500, seed=13)
    sim = simulate_phenotype(gd, n_qtl=25, h2=0.6, seed=13)
    prefix = str(tmp_path / "g")
    plink.write_plink_genotypes(prefix, gd)
    y = sim.phenotypes.copy()
    y[-20:] = np.nan  # prediction set
    write_pheno(prefix + ".pheno", gd.samples, y)

    def run(nd, tag):
        import janusx_tpu.workflows.gwas as W

        old = W.resolve_mesh
        if nd == 1:
            W.resolve_mesh = lambda n: None
        try:
            return run_gs(GsConfig(
                genotype=prefix, phenotype=prefix + ".pheno",
                methods=("BLUP",), cv=3,
                out_prefix=str(tmp_path / tag)))
        finally:
            W.resolve_mesh = old

    _, s1 = run(1, "single")
    _, s8 = run(8, "mesh")
    cv1 = s1["traits"]["trait0"]["BLUP"]["cv"]
    cv8 = s8["traits"]["trait0"]["BLUP"]["cv"]
    assert cv8["pearson"] == pytest.approx(cv1["pearson"], abs=1e-4)
    g1 = open(str(tmp_path / "single.trait0.gebv.tsv")).read().splitlines()
    g8 = open(str(tmp_path / "mesh.trait0.gebv.tsv")).read().splitlines()
    for a, b in zip(g1[1:], g8[1:]):
        sa, va = a.split("\t")
        sb, vb = b.split("\t")
        assert sa == sb
        assert float(va) == pytest.approx(float(vb), abs=2e-3)


def test_windowed_sharded_scan_chromosome_scale(mesh8, tmp_path):
    """Disk-backed (windowed) input composed with the 8-way mesh at
    m > 2^20 with an UNEVEN final shard: the scan must stream superblocks
    through the sharded resident kernel and agree with single-device
    scans of spot-check slices (head + uneven tail)."""
    from janusx_tpu.io import plink
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.io.packed import QcParams
    from janusx_tpu.io.windowed import WindowedBed
    from janusx_tpu.models.lm import lm_scan

    rng = np.random.default_rng(31)
    m, n = (1 << 20) + 37, 64  # > 2^20, not divisible by 8*block
    p = rng.uniform(0.1, 0.5, size=m).astype(np.float32)
    g = np.empty((m, n), np.int8)
    step = 1 << 17
    for s in range(0, m, step):
        e = min(s + step, m)
        g[s:e] = rng.binomial(2, p[s:e, None], size=(e - s, n)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object),
        pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object),
        allele1=np.array(["G"] * m, object),
    )
    gd = GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object))
    prefix = str(tmp_path / "big")
    plink.write_plink_genotypes(prefix, gd)
    del g, gd

    wp = WindowedBed(prefix, window=1 << 17).prepare(QcParams(maf=0.0, geno=1.0))
    wp.max_resident_snps = 1 << 17  # force true superblock streaming
    assert wp.m == m
    y = rng.normal(size=n)

    # spy on the packed-buffer uploads: every superblock must arrive
    # SNP-sharded in 1/8 per-device slices (ephemeral windowed uploads are
    # evicted from the device cache on GC, so inspect at upload time)
    from janusx_tpu.utils import devcache

    seen_shards = []
    orig_upload = devcache.device_packed_blocks

    def spy(pg_, shape, **kw):
        out = orig_upload(pg_, shape, **kw)
        if getattr(out.sharding, "num_devices", 1) == 8:
            seen_shards.append(
                (out.shape, out.addressable_shards[0].data.shape))
        return out

    devcache.device_packed_blocks = spy
    try:
        res = lm_scan(wp, y, block=4096, mesh=mesh8)
    finally:
        devcache.device_packed_blocks = orig_upload
    assert res.m == m
    assert np.isfinite(res.beta).all()
    assert seen_shards, "windowed superblocks were not mesh-sharded"
    for full, local in seen_shards:
        assert local[1] == full[1] // 8

    # spot-check slices against single-device scans (incl. the 37-SNP
    # uneven tail, whose pad lanes must be dropped, not reported)
    for lo, hi in ((0, 4096), (m - 4096 - 37, m)):
        sub = wp.take_snps(np.arange(lo, hi))
        ref = lm_scan(sub, y, block=4096)
        np.testing.assert_allclose(
            res.beta[lo:hi], ref.beta, rtol=2e-3, atol=1e-6, equal_nan=True)
        ok = np.isfinite(ref.pwald) & (ref.pwald > 0)
        dlogp = np.abs(np.log10(res.pwald[lo:hi][ok]) - np.log10(ref.pwald[ok]))
        assert np.nanmax(dlogp) < 5e-3

def test_grm_sharded_hlo_has_one_allreduce(mesh8, rng):
    """The compiled sharded-GRM program contains exactly ONE cross-device
    reduction (the single psum over ICI the design promises)."""
    from janusx_tpu.models.grm import _grm_sharded
    from janusx_tpu.utils import devcache

    pg = _toy_pg(rng, m=512, n=96)
    shape = (2, 4, 64)
    pk = devcache.device_packed_blocks(pg, shape, mesh=mesh8, shard_axis=2)
    mn = devcache.to_device_blocks(
        pg.mean.astype(np.float32), shape, 0.0, dtype=jnp.float32,
        mesh=mesh8, shard_axis=2)
    iv = devcache.to_device_blocks(
        np.ones(pg.m, np.float32), shape, 0.0, dtype=jnp.float32,
        mesh=mesh8, shard_axis=2)
    hlo = _grm_sharded(mesh8, jnp.float64, False).lower(
        pk, mn, iv).compile().as_text()
    n_ar = hlo.count("all-reduce-start") or hlo.count("all-reduce(")
    assert n_ar == 1, f"expected 1 all-reduce, found {n_ar}"


def test_distributed_recipe_single_process():
    """The documented multi-host recipe must execute end-to-end (here with
    process_count=1 over the 8 virtual devices): padded totals, host slice,
    and global array assembly agree for non-divisible m_total."""
    import jax
    import numpy as np

    from janusx_tpu.parallel import distributed as dist

    for m_total in (10, 16, 17, 129):
        m_pad = dist.padded_snp_total(m_total)
        assert m_pad % jax.device_count() == 0 and m_pad >= m_total
        lo, hi = dist.host_snp_range(m_total)
        assert (lo, hi) == (0, m_pad)  # single process owns everything
        mesh = dist.global_snp_mesh()
        block = np.arange(hi - lo, dtype=np.float32)[:, None] * np.ones((1, 3), np.float32)
        g = dist.make_global_snp_array(mesh, block, m_total)
        assert g.shape == (m_pad, 3)
        np.testing.assert_array_equal(np.asarray(g), block)
        # wrong local shape is a loud error, not silent misalignment
        import pytest as _pytest

        with _pytest.raises(ValueError):
            dist.make_global_snp_array(mesh, block[:-1], m_total)


def test_run_gwas_trait_level_sharded_matches_single(tmp_path):
    """The -trait-level batched multi-trait scan through the 8-device mesh
    (_lmm_scan_sharded_multi, models/lmm.py:607) vs single device —
    multiple same-mask traits, uneven m (VERDICT r3 weak #3)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from janusx_tpu.io.plink import write_plink
    from janusx_tpu.workflows.gwas import GwasConfig, run_gwas

    rng = np.random.default_rng(11)
    pg = _toy_pg(rng, m=301, n=90)  # m not divisible by 8
    geno = str(tmp_path / "tl")
    write_plink(geno, pg.packed, pg.n_samples, pg.sites, pg.samples)
    gc = pg.centered()
    Y = np.column_stack([
        rng.normal(size=pg.n) + gc[7] * 0.6,
        rng.normal(size=pg.n) + gc[40] * 0.8,
        rng.normal(size=pg.n) - gc[120] * 0.7,
    ])
    with open(tmp_path / "tl.pheno", "wt") as fh:
        fh.write("id\tt1\tt2\tt3\n")
        for i, s in enumerate(pg.samples):
            fh.write(f"{s}\t" + "\t".join(f"{v:.6f}" for v in Y[i]) + "\n")

    common = dict(
        genotype=geno + ".bed", phenotype=str(tmp_path / "tl.pheno"),
        models=("lmm",), force_model=True, block=64, use_cache=False,
        trait_level=True,
    )
    res1 = run_gwas(GwasConfig(out_prefix=str(tmp_path / "t1"),
                               n_devices=1, **common))
    res8 = run_gwas(GwasConfig(out_prefix=str(tmp_path / "t8"),
                               n_devices=8, **common))
    assert len(res1) == len(res8) == 3
    by1 = {r.trait: r.result for r in res1}
    by8 = {r.trait: r.result for r in res8}
    assert set(by1) == set(by8)
    for trait in by1:
        a, b = by1[trait], by8[trait]
        np.testing.assert_allclose(b.beta, a.beta, rtol=2e-3, atol=1e-5,
                                   equal_nan=True)
        dlogp = np.abs(np.log10(b.pwald) - np.log10(a.pwald))
        assert np.nanmax(dlogp) < 5e-3, trait
    # the combined trait-level TSV exists for both runs with equal row sets
    tsv1 = str(tmp_path / "t1") + ".traitlevel.assoc.tsv"
    tsv8 = str(tmp_path / "t8") + ".traitlevel.assoc.tsv"
    import os

    assert os.path.exists(tsv1) and os.path.exists(tsv8)
    assert sum(1 for _ in open(tsv1)) == sum(1 for _ in open(tsv8))


def test_distributed_two_process_recipe(tmp_path):
    """Spawn TWO actual jax.distributed processes (CPU backend, gloo
    collectives, 4 virtual devices each) and run the full
    parallel/distributed.py recipe: host_snp_range host-local slices,
    make_global_snp_array assembly, one sharded GRM psum + all-gathered
    scan — asserting equality with an independent numpy reference
    (VERDICT r4 item 3: the only pre-hardware test of the >=2-host
    contract in distributed.py:66-101)."""
    import os
    import socket
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    # free port for the coordinator (close-then-reuse is racy in theory,
    # but the window is ms and the test skips on bind failure)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    # the workers pick their own device count / platform via jax.config;
    # drop the parent's 8-device forcing and any frozen platform choice
    env.pop("XLA_FLAGS", None)
    env.pop("JX_TPU_PLATFORM", None)
    repo_root = os.path.dirname(os.path.dirname(worker))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(worker)),
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("2-process cluster did not form within 180 s")

    joined = "\n---\n".join(outs)
    if any("DIST_SKIP" in o for o in outs):
        pytest.skip(f"worker skipped: {joined[-500:]}")
    assert all(p.returncode == 0 for p in procs), joined[-3000:]
    assert all("DIST_OK" in o for o in outs), joined[-3000:]

    # parent-side independent check of the saved result
    data = np.load(tmp_path / "dist_result.npz")
    rng2 = np.random.default_rng(7)
    G = rng2.integers(0, 3, size=(101, 24)).astype(np.float32)
    y = rng2.normal(size=24).astype(np.float32)
    np.testing.assert_allclose(data["K"], G.T @ G, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        data["beta"], (G @ y) / (G * G).sum(axis=1), rtol=1e-5, atol=1e-6)


def test_distributed_grm_single_process_equals_full(rng):
    """distributed_grm == grm_from_packed in single-process mode (the
    multi-host driver reduces exactly; cross-process equality is in
    dist_worker.py)."""
    from janusx_tpu.models.grm import grm_from_packed
    from janusx_tpu.parallel import distributed as dist

    pg = _toy_pg(rng, m=301, n=50)
    np.testing.assert_allclose(
        dist.distributed_grm(pg), grm_from_packed(pg), rtol=1e-12, atol=1e-12)
    # windowed disk-backed source path: host-local range reads
    import tempfile

    from janusx_tpu.io.plink import write_plink
    from janusx_tpu.io.windowed import WindowedBed

    with tempfile.TemporaryDirectory() as td:
        prefix = td + "/wp"
        write_plink(prefix, pg.packed, pg.n_samples, pg.sites, pg.samples)
        wp = WindowedBed(prefix).prepare()
        np.testing.assert_allclose(
            dist.distributed_grm(wp), grm_from_packed(pg),
            rtol=1e-10, atol=1e-10)


def test_distributed_scan_single_process_equals_full(rng):
    """distributed_scan == the direct production scan in single-process
    mode (lm + lmm routes); cross-process equality runs in
    dist_worker.py."""
    from janusx_tpu.core.spectral import eigh_grm
    from janusx_tpu.models.grm import grm_from_packed
    from janusx_tpu.models.lm import lm_scan
    from janusx_tpu.models.lmm import lmm_scan
    from janusx_tpu.parallel import distributed as dist

    pg = _toy_pg(rng, m=217, n=60)
    y = rng.normal(size=pg.n) + pg.centered()[5] * 0.5

    d = dist.distributed_scan(pg, lambda sub: lm_scan(sub, y))
    ref = lm_scan(pg, y)
    np.testing.assert_allclose(d.beta, ref.beta, rtol=0, atol=0,
                               equal_nan=True)
    np.testing.assert_allclose(d.pwald, ref.pwald, rtol=0, atol=0,
                               equal_nan=True)
    assert d.m == pg.m and list(d.sites.snp) == list(pg.sites.snp)

    basis = eigh_grm(grm_from_packed(pg), diag_ridge=1e-6)
    d2 = dist.distributed_scan(
        pg, lambda sub: lmm_scan(sub, basis, y, use_pallas=False)[0])
    ref2, _ = lmm_scan(pg, basis, y, use_pallas=False)
    np.testing.assert_allclose(d2.beta, ref2.beta, rtol=0, atol=0,
                               equal_nan=True)
