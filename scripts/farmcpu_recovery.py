"""Full FarmCPU planted-QTN recovery grid (VERDICT r2 item 7).

Sweeps n in {500, 2000}, m in {5k, 50k}, h2 in {0.3, 0.6}, 10 seeds for
both the raw `-farmcpu` and unified `-frgwas` routes, reporting recall
of planted QTNs within the bin window and the false Bonferroni-hit rate.
The CI-sized subset lives in tests/test_farmcpu_recovery.py; run this
script for the full behavioral sweep (expect ~1-2 h on CPU).

  python scripts/farmcpu_recovery.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tests.test_farmcpu_recovery import _problem, _recovery  # noqa: E402
from janusx_tpu.models.farmcpu import (  # noqa: E402
    farmcpu_scan, farmcpu_unified_scan,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="3 seeds and the small panel only")
    args = ap.parse_args()
    ns = (500,) if args.quick else (500, 2000)
    ms = (5000,) if args.quick else (5000, 50_000)
    seeds = range(3) if args.quick else range(10)
    rows = []
    for unified in (False, True):
        fn = farmcpu_unified_scan if unified else farmcpu_scan
        for n in ns:
            for m in ms:
                for h2 in (0.3, 0.6):
                    recalls, fps, secs = [], [], []
                    for seed in seeds:
                        pg, y, planted = _problem(n, m, h2, seed)
                        t0 = time.time()
                        out = fn(pg, y)
                        secs.append(time.time() - t0)
                        r, f = _recovery(pg, planted, out)
                        recalls.append(r / len(planted))
                        fps.append(f)
                    row = {
                        "route": "frgwas" if unified else "farmcpu",
                        "n": n, "m": m, "h2": h2,
                        "recall_mean": round(float(np.mean(recalls)), 3),
                        "recall_min": round(float(np.min(recalls)), 3),
                        "fp_sig_max": int(np.max(fps)),
                        "sec_mean": round(float(np.mean(secs)), 1),
                    }
                    rows.append(row)
                    print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
