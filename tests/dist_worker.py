"""Two-process jax.distributed worker (helper for tests/test_sharding.py).

Run as:  python dist_worker.py <process_id> <num_processes> <port> <outdir>

Exercises the documented multi-host recipe in
janusx_tpu/parallel/distributed.py — the ONLY way the >=2-host contract
(process-major device ordering, host_snp_range slicing,
make_array_from_process_local_data assembly, cross-process collectives)
can be tested before real multi-host hardware: two separate Python
processes on the CPU backend with gloo collectives
(jax_cpu_collectives_implementation), 4 virtual devices each.

Protocol (read by the parent test):
  - prints "DIST_SKIP <reason>" and exits 0 when the environment cannot
    form the 2-process cluster (infrastructure, not a product bug);
  - prints "DIST_OK" and exits 0 on success; process 0 additionally
    writes <outdir>/dist_result.npz with the computed GRM + scan betas
    for the parent's independent numpy check;
  - any assertion failure exits nonzero (a REAL contract violation).
"""

from __future__ import annotations

import sys


def main() -> int:
    pid, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
    import jax

    # The environment may have frozen JAX_PLATFORMS at interpreter start
    # (sitecustomize imports jax); config updates still work pre-backend.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception as e:  # gloo not compiled into this jaxlib
        print(f"DIST_SKIP no-gloo {e}", flush=True)
        return 0

    from janusx_tpu.parallel import distributed as dist

    dist.initialize(coordinator=f"127.0.0.1:{port}",
                    num_processes=nproc, process_id=pid)
    if jax.process_count() != nproc:
        print(f"DIST_SKIP process_count={jax.process_count()}", flush=True)
        return 0

    import numpy as np
    import jax.numpy as jnp  # noqa: F401  (backend init ordering)
    from jax.sharding import PartitionSpec as P

    assert jax.device_count() == 4 * nproc
    assert jax.local_device_count() == 4

    # Deterministic shared panel, m_total NOT divisible by device count
    # so the padded-tail contract is exercised.
    m_total, n = 101, 24
    rng = np.random.default_rng(7)
    G = rng.integers(0, 3, size=(m_total, n)).astype(np.float32)
    y = rng.normal(size=n).astype(np.float32)

    mesh = dist.global_snp_mesh()
    m_pad = dist.padded_snp_total(m_total)
    assert m_pad % jax.device_count() == 0 and m_pad >= m_total

    # host_snp_range: contiguous, process-major, device-count weighted.
    lo, hi = dist.host_snp_range(m_total)
    per_dev = m_pad // jax.device_count()
    assert (lo, hi) == (pid * 4 * per_dev, (pid + 1) * 4 * per_dev), (
        f"host slice [{lo},{hi}) is not the process-major contiguous block")

    # "host-local read": slice only this host's rows; tail rows are padding.
    Gp = np.zeros((m_pad, n), np.float32)
    Gp[:m_total] = G
    block = np.ascontiguousarray(Gp[lo:hi])
    g = dist.make_global_snp_array(mesh, block, m_total)
    assert g.shape == (m_pad, n)

    yg = jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(mesh, P()), y, y.shape)

    ax = dist.SNP_AXIS

    def body(gs, ys):
        # one sharded GRM (the single-psum merge the design promises) +
        # one embarrassingly-parallel marginal scan, all-gathered back.
        k = jax.lax.psum(gs.T @ gs, ax)
        num = gs @ ys
        den = (gs * gs).sum(axis=1)
        beta = jnp.where(den > 0, num / jnp.maximum(den, 1e-30), jnp.nan)
        return k, jax.lax.all_gather(beta, ax, tiled=True)

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(ax), P()), out_specs=(P(), P()),
        check_vma=False))  # tiled all_gather replication isn't VMA-inferred
    K, beta = fn(g, yg)
    K = np.asarray(jax.device_get(K))
    beta = np.asarray(jax.device_get(beta))

    # every process checks against its own full-data numpy reference
    K_ref = G.T @ G
    beta_ref = (G @ y) / (G * G).sum(axis=1)
    np.testing.assert_allclose(K, K_ref, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(beta[:m_total], beta_ref, rtol=1e-5, atol=1e-6)
    assert np.isnan(beta[m_total:]).all()  # padding rows must be masked

    # production multi-host GRM entry: each process contributes only its
    # host_snp_range slice; result must equal the local full-data build
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.io.packed import QcParams, pack_genotypes
    from janusx_tpu.models.grm import grm_from_packed

    mg, ng = 97, 18  # not divisible by the 8 global devices
    rng2 = np.random.default_rng(21)
    codes = rng2.integers(0, 3, size=(mg, ng)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * mg, object),
        pos=np.arange(1, mg + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(mg)], object),
        allele0=np.array(["A"] * mg, object),
        allele1=np.array(["G"] * mg, object),
    )
    gd = GenotypeData(codes, sites,
                      np.array([f"i{j}" for j in range(ng)], object))
    pgv = pack_genotypes(gd, QcParams(maf=0.0, geno=1.0))
    K_dist = dist.distributed_grm(pgv)
    K_ref = grm_from_packed(pgv)
    # the host split regroups the f32 partial-gram accumulation (block
    # padding per slice), so agreement is at f32-gram noise — same
    # tolerance class as the mesh-vs-single production tests
    np.testing.assert_allclose(K_dist, K_ref, rtol=1e-4, atol=1e-6)

    # production multi-host scan driver on the same panel
    from janusx_tpu.models.lm import lm_scan

    yv = rng2.normal(size=ng)
    d_scan = dist.distributed_scan(pgv, lambda sub: lm_scan(sub, yv))
    ref_scan = lm_scan(pgv, yv)
    np.testing.assert_allclose(d_scan.beta, ref_scan.beta,
                               rtol=2e-3, atol=1e-6, equal_nan=True)
    okp = np.isfinite(ref_scan.pwald) & (ref_scan.pwald > 0)
    dlogp = np.abs(np.log10(d_scan.pwald[okp]) - np.log10(ref_scan.pwald[okp]))
    assert np.nanmax(dlogp) < 5e-3

    # full multi-host LMM GWAS flow: distributed GRM -> replicated eigh
    # -> distributed exact-LMM scan (the flagship pipeline, scaled out)
    from janusx_tpu.core.spectral import eigh_grm
    from janusx_tpu.models.lmm import lmm_scan

    basis = eigh_grm(K_dist, diag_ridge=1e-6)
    yl = yv + pgv.centered()[7] * 0.6
    d_lmm = dist.distributed_scan(
        pgv, lambda sub: lmm_scan(sub, basis, yl, use_pallas=False)[0])
    ref_lmm, _ = lmm_scan(pgv, basis, yl, use_pallas=False)
    np.testing.assert_allclose(d_lmm.beta, ref_lmm.beta,
                               rtol=2e-3, atol=1e-6, equal_nan=True)
    okl = np.isfinite(ref_lmm.pwald) & (ref_lmm.pwald > 0)
    dlogp_l = np.abs(
        np.log10(d_lmm.pwald[okl]) - np.log10(ref_lmm.pwald[okl]))
    assert np.nanmax(dlogp_l) < 5e-3

    if pid == 0:
        np.savez(f"{outdir}/dist_result.npz", K=K, beta=beta[:m_total],
                 K_grm=K_dist, scan_beta=d_scan.beta,
                 lmm_beta=d_lmm.beta)
    print("DIST_OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
