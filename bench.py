"""Flagship benchmark: exact-LMM GWAS scan throughput (steady state).

Measures the hot path of `jx gwas -lmm` (per-SNP REML scan: packed 2-bit
decode + eigenbasis rotate + shared λ-grid search + beta/se/Wald) end to
end on the available accelerator, excluding one-time compile.

Workload: mouse_hs1940 trait test0 (n=1410 analysis samples, m~=8.9k QC'd
SNPs), with the QC'd SNP set tiled to m~=144k and m~=287k (human
chromosome 1-2 scale). Every SNP column scanned is real genotype data and
runs the identical production code path
(`janusx_tpu.models.lmm.lmm_scan`); only the scan length is extended.

Weather-proofing (round-4): the headline number is the per-SNP SLOPE fit
across the two m values — (t2 - t1) / (m2 - m1) — which cancels the fixed
per-call cost (host sync + axon relay round-trip, ~35 ms/call but
30-200 ms under relay weather; round-3 same-session raw quotients at
m=287k swung 0.79-1.32M SNPs/s purely from that term). The raw m2
quotient is reported alongside as `value_raw`, and the fixed cost as
`fixed_ms_per_call`.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

vs_baseline divides by a MEASUREMENT: the reference's scan loop
re-implemented faithfully on this machine's CPU (native/jxbaseline.cpp —
per-SNP warm-started Brent, tol 1e-2 / max 50 iterations per
/root/reference/src/stats/lmm.rs:334,1480; REML objective reml.rs:255;
f32 BLAS rotation; one thread per core), timed on the SAME workload.
The round-1/2 analytic 20k SNPs/s estimate is kept in the JSON as a
cross-check. The driver target is >=10x per chip.
"""

from __future__ import annotations

import json
import os
import threading
import time

import numpy as np

# Honest relay watchdog: the axon tunnel sometimes goes down for hours
# (jax.devices() then blocks forever). If the benchmark makes no progress
# for WATCHDOG_S, print ONE diagnostic JSON line saying so and exit —
# a recorded outage beats a driver-side timeout with no output.
WATCHDOG_S = 480.0
_progress = {"t": time.monotonic(), "stage": "init"}


def _tick(stage: str) -> None:
    _progress["t"] = time.monotonic()
    _progress["stage"] = stage


def _watchdog() -> None:
    while True:
        time.sleep(10)
        idle = time.monotonic() - _progress["t"]
        if idle > WATCHDOG_S:
            print(json.dumps({
                "metric": "lmm_scan_snps_per_sec_steady_state",
                "value": None,
                "unit": "SNPs/s",
                "vs_baseline": None,
                "error": "tpu_relay_unreachable",
                "stalled_stage": _progress["stage"],
                "stalled_seconds": round(idle, 1),
            }), flush=True)
            os._exit(3)


ANALYTIC_BASELINE_SNPS_PER_SEC = 20_000.0  # retained cross-check only
TILE_SMALL = 16  # ~144k SNPs
TILE_BIG = 32  # ~287k SNPs


def measure_baseline(basis, y, Gc: np.ndarray, lg_init: float):
    """Reference-loop CPU throughput (SNPs/s) on this machine, timed on
    the same (rotated-scan) workload: f32 BLAS rotate + threaded per-SNP
    warm Brent. Returns None when the native toolchain is unavailable."""
    from janusx_tpu.utils import baseline_cpu

    if not baseline_cpu.available():
        return None
    Gc32 = np.ascontiguousarray(Gc, np.float32)
    big = np.concatenate([Gc32] * TILE_BIG, axis=0)
    # warm-up on a slice (thread spawn, page-in, BLAS init)
    baseline_cpu.baseline_scan(basis, y, Gc32[:2048], lg_init=lg_init)
    times = []
    for _ in range(2):
        t0 = time.monotonic()
        baseline_cpu.baseline_scan(basis, y, big, lg_init=lg_init)
        times.append(time.monotonic() - t0)
    return big.shape[0] / min(times)


def main() -> None:
    # start the watchdog ONLY when run as a benchmark (importing bench
    # from tests must not spawn a thread that can exit the process)
    threading.Thread(target=_watchdog, daemon=True).start()
    _tick("jax import")
    import jax

    from janusx_tpu.core.spectral import eigh_grm
    from janusx_tpu.io.gfreader import load_raw_packed
    from janusx_tpu.io.packed import PackedGenotypes, QcParams
    from janusx_tpu.io.pheno import load_phenotype
    from janusx_tpu.models.grm import grm_from_packed
    from janusx_tpu.models.lmm import lmm_scan
    from janusx_tpu.models.scan_common import analysis_sample_index

    _tick("load vcf")
    raw = load_raw_packed("/root/reference/example/mouse_hs1940.vcf.gz")
    ph = load_phenotype("/root/reference/example/mouse_hs1940.pheno")
    y_all, _ = ph.align(raw.samples)
    y = y_all[:, 0]  # test0
    keep = analysis_sample_index(y)
    qc = QcParams()
    pg_full = raw.prepare(qc)
    _tick("grm (first device work)")
    K = grm_from_packed(pg_full)
    pg = raw.prepare(qc, sample_idx=keep)
    basis = eigh_grm(K[np.ix_(keep, keep)], diag_ridge=1e-6)

    small = PackedGenotypes.concat([pg] * TILE_SMALL)
    big = PackedGenotypes.concat([pg] * TILE_BIG)

    # warm-up (compile + null fit + device-resident state cache); both m
    # values hit the same compiled superblock kernel
    _tick("scan compile + warmup")
    res, null = lmm_scan(pg, basis, y[keep], block=4608)
    lmm_scan(big, basis, y[keep], block=4608, null=null)
    lmm_scan(small, basis, y[keep], block=4608, null=null)

    def timed(pgx, reps):
        ts = []
        for _ in range(reps):
            _tick("timed scan")
            t0 = time.monotonic()
            lmm_scan(pgx, basis, y[keep], block=4608, null=null)
            ts.append(time.monotonic() - t0)
        return min(ts)

    t_small = timed(small, 4)
    t_big = timed(big, 5)
    raw_snps_per_sec = big.m / t_big
    # two-m fit: slope cancels the fixed per-call (relay) cost
    slope = (t_big - t_small) / (big.m - small.m)  # seconds per SNP
    if slope > 0:
        slope_snps_per_sec = 1.0 / slope
        fixed_ms = max((t_big - slope * big.m) * 1e3, 0.0)
    else:
        # relay noise swamped the m delta this session; fall back to the
        # raw quotient rather than report a negative slope
        slope_snps_per_sec = raw_snps_per_sec
        fixed_ms = 0.0

    _tick("cpu baseline")
    base = measure_baseline(basis, y[keep], pg.centered(), null.log10_lbd)
    denom = base if base else ANALYTIC_BASELINE_SNPS_PER_SEC
    print(
        json.dumps(
            {
                "metric": "lmm_scan_snps_per_sec_steady_state",
                "value": round(slope_snps_per_sec, 1),
                "unit": "SNPs/s",
                "vs_baseline": round(slope_snps_per_sec / denom, 3),
                "value_slope": round(slope_snps_per_sec, 1),
                "value_raw": round(raw_snps_per_sec, 1),
                "fixed_ms_per_call": round(fixed_ms, 1),
                "m_small": small.m,
                "m_big": big.m,
                "baseline_snps_per_sec": None if base is None else round(base, 1),
                "baseline_kind": "measured_cpu_reference_loop" if base else "analytic_fallback",
                "baseline_analytic_snps_per_sec": ANALYTIC_BASELINE_SNPS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
