"""Flagship benchmark: exact-LMM GWAS scan throughput on mouse_hs1940.

Measures the hot path of `jx gwas -lmm` (per-SNP REML Brent scan, trait
test0: n=1410 analysis samples, m~=8.9k QC'd SNPs) on the available
accelerator, end to end from packed blocks (decode + rotate + batched
Brent + beta/se), excluding one-time compile.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: ratio against 20,000 SNPs/s — an analytic estimate of the
reference's Rust CPU path for this problem size (per-SNP warm-started
Brent, ~15 REML evals x O(n p^2) flops each, 8 threads; the reference
repo publishes no absolute LMM throughput — BASELINE.md). The driver
target is >=10x this value per chip.
"""

from __future__ import annotations

import json
import time

import numpy as np

RUST_CPU_BASELINE_SNPS_PER_SEC = 20_000.0


def main() -> None:
    import jax

    from janusx_tpu.core.spectral import eigh_grm
    from janusx_tpu.io.gfreader import load_raw_packed
    from janusx_tpu.io.packed import QcParams
    from janusx_tpu.io.pheno import load_phenotype
    from janusx_tpu.models.grm import grm_from_packed
    from janusx_tpu.models.lmm import lmm_scan
    from janusx_tpu.models.scan_common import analysis_sample_index

    raw = load_raw_packed("/root/reference/example/mouse_hs1940.vcf.gz")
    ph = load_phenotype("/root/reference/example/mouse_hs1940.pheno")
    y_all, _ = ph.align(raw.samples)
    y = y_all[:, 0]  # test0
    keep = analysis_sample_index(y)
    qc = QcParams()
    pg_full = raw.prepare(qc)
    K = grm_from_packed(pg_full)
    pg = raw.prepare(qc, sample_idx=keep)
    basis = eigh_grm(K[np.ix_(keep, keep)], diag_ridge=1e-6)

    # warm-up (compile + null fit + device-resident state cache)
    res, null = lmm_scan(pg, basis, y[keep], block=4608)
    lmm_scan(pg, basis, y[keep], block=4608, null=null)
    # timed runs
    times = []
    for _ in range(5):
        t0 = time.monotonic()
        lmm_scan(pg, basis, y[keep], block=4608, null=null)
        times.append(time.monotonic() - t0)
    best = min(times)
    snps_per_sec = pg.m / best
    print(
        json.dumps(
            {
                "metric": "lmm_scan_snps_per_sec_mouse_hs1940",
                "value": round(snps_per_sec, 1),
                "unit": "SNPs/s",
                "vs_baseline": round(
                    snps_per_sec / RUST_CPU_BASELINE_SNPS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
