"""Biobank-scale low-memory demo: n=10k x m=1M PLINK scan under a RSS cap.

Reference target: the SparseLMM workflow on n=10,000 x m=1,000,000 PLINK
peaks at ~650 MB RSS (doc/release/v1.0.27.md:22, BASELINE.md). This demo
drives the windowed (disk-backed) path end-to-end:

  synthesize 2.5 GB BED -> WindowedBed QC pass -> lm_scan streamed
  (and optionally the band-streamed sparse GRM + GRAMMAR splmm scan)

and reports peak RSS. Run on CPU:

  JAX_PLATFORMS=cpu python scripts/biobank_lowmem.py [--m 1000000] [--n 10000]
"""

import argparse
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the environment's sitecustomize imports jax before this script runs, so
# JAX_PLATFORMS in the env is frozen — override via config (see conftest)
if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def peak_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def synthesize_bed(prefix: str, m: int, n: int, seed: int = 0) -> None:
    """Write a synthetic PLINK fileset directly in packed form.

    Bytes are drawn uniformly from the 81 byte values whose four 2-bit
    codes are all non-missing ({hom0, het, hom1}) — every SNP passes QC
    with af ~= 0.5 and zero missingness, which is the worst (largest)
    case for the scan since nothing is filtered.
    """
    from janusx_tpu.io import bitcodec, plink

    nb = bitcodec.n_bytes(n)
    codes_ok = (0, 2, 3)  # BED codes: 00 hom_alt, 10 het, 11 hom_ref
    allowed = []
    for b0 in codes_ok:
        for b1 in codes_ok:
            for b2 in codes_ok:
                for b3 in codes_ok:
                    allowed.append(b0 | (b1 << 2) | (b2 << 4) | (b3 << 6))
    allowed = np.array(sorted(allowed), np.uint8)
    rng = np.random.default_rng(seed)
    t0 = time.time()
    with open(prefix + ".bed", "wb") as fh:
        fh.write(plink.BED_MAGIC)
        chunk = 1 << 14
        for s in range(0, m, chunk):
            rows = min(chunk, m - s)
            idx = rng.integers(0, len(allowed), size=rows * nb, dtype=np.uint8)
            fh.write(allowed[idx].tobytes())
    print(f"bed written: {os.path.getsize(prefix + '.bed')/1e9:.2f} GB "
          f"in {time.time()-t0:.0f}s", flush=True)
    with open(prefix + ".bim", "wt") as fh:
        for i in range(m):
            fh.write(f"1\ts{i}\t0\t{i+1}\tA\tG\n")
    with open(prefix + ".fam", "wt") as fh:
        for j in range(n):
            fh.write(f"i{j}\ti{j}\t0\t0\t0\t-9\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1_000_000)
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--dir", default="/tmp/jx_biobank")
    ap.add_argument("--keep", action="store_true", help="keep the BED files")
    ap.add_argument("--route", default="lm", choices=("lm", "splmm", "both"),
                    help="lm = windowed OLS scan; splmm = the reference's "
                         "headline workflow (band-streamed sparse GRM -> "
                         "sparse null -> GRAMMAR-gamma scan)")
    ap.add_argument("--window", type=int, default=1 << 14,
                    help="QC/streaming window in SNPs (host packed bytes "
                         "per window = window * n/4)")
    ap.add_argument("--max-resident", type=int, default=1 << 15,
                    help="scan superblock residency in SNPs")
    ap.add_argument("--row-band", type=int, default=4096,
                    help="sparse-GRM row-band height (host band = band*n*4 B)")
    args = ap.parse_args()

    os.makedirs(args.dir, exist_ok=True)
    prefix = os.path.join(args.dir, f"syn_{args.n}x{args.m}")
    if not os.path.exists(prefix + ".bed"):
        synthesize_bed(prefix, args.m, args.n)
    print(f"after synth: peak RSS {peak_rss_mb():.0f} MB", flush=True)

    from janusx_tpu.io.packed import QcParams
    from janusx_tpu.io.windowed import WindowedBed
    from janusx_tpu.models.lm import lm_scan

    t0 = time.time()
    wb = WindowedBed(prefix, window=args.window)
    wp = wb.prepare(QcParams())
    wp.max_resident_snps = args.max_resident
    t_qc = time.time() - t0
    print(f"QC pass: m_kept={wp.m} in {t_qc:.0f}s, "
          f"peak RSS {peak_rss_mb():.0f} MB", flush=True)

    rng = np.random.default_rng(1)
    y = rng.normal(size=wp.n)
    stages = {"qc_s": round(t_qc)}
    if args.route in ("lm", "both"):
        t0 = time.time()
        res = lm_scan(wp, y)
        t_scan = time.time() - t0
        assert np.isfinite(res.pwald).all()
        stages["lm_scan_s"] = round(t_scan)
        print(f"lm_scan: {wp.m} SNPs in {t_scan:.0f}s "
              f"({wp.m/t_scan:.0f} SNPs/s), peak RSS {peak_rss_mb():.0f} MB",
              flush=True)
    if args.route in ("splmm", "both"):
        from janusx_tpu.models.splmm import (
            build_sparse_grm, splmm_grammar_scan,
        )

        t0 = time.time()
        Ks = build_sparse_grm(wp, row_band=args.row_band)
        t_grm = time.time() - t0
        stages["spgrm_s"] = round(t_grm)
        nnz_off = Ks.nnz - args.n
        print(f"sparse GRM: n={Ks.shape[0]} nnz={Ks.nnz} "
              f"(off-diag kept {nnz_off}) in {t_grm:.0f}s, "
              f"peak RSS {peak_rss_mb():.0f} MB", flush=True)
        t0 = time.time()
        res, info = splmm_grammar_scan(wp, Ks, y)
        t_scan = time.time() - t0
        assert np.isfinite(res.pwald).all()
        stages["splmm_scan_s"] = round(t_scan)
        print(f"splmm grammar scan: {wp.m} SNPs in {t_scan:.0f}s "
              f"({wp.m/t_scan:.0f} SNPs/s), lambda={info.get('lambda_null', '?')}, "
              f"peak RSS {peak_rss_mb():.0f} MB", flush=True)
    peak = peak_rss_mb()
    stage_txt = " ".join(f"{k}={v}" for k, v in stages.items())
    print(f"RESULT route={args.route} peak_rss_mb={peak:.0f} {stage_txt} "
          f"m={wp.m} n={wp.n}", flush=True)
    if not args.keep:
        for ext in (".bed", ".bim", ".fam"):
            os.unlink(prefix + ext)


if __name__ == "__main__":
    main()
