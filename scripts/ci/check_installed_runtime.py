#!/usr/bin/env python
"""Probe an INSTALLED janusx-tpu (not the repo checkout).

Mirrors the reference's post-wheel-install probe
(/root/reference/scripts/ci/check_installed_runtime.py): import from the
installed location, confirm the native helpers resolve to the packaged
``_native`` payload (or cleanly report fallback), and drive one tiny
end-to-end flow. Run from OUTSIDE the repo directory, e.g.:

    pip install dist/janusx_tpu-*.whl
    cd /tmp && python /path/to/scripts/ci/check_installed_runtime.py

Exits nonzero on any failure; prints one PASS line per check.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile


def check(name: str, ok: bool, detail: str = "") -> bool:
    print(f"{'PASS' if ok else 'FAIL'}: {name}" + (f" ({detail})" if detail else ""))
    return ok


def main() -> int:
    failures = 0

    import janusx_tpu

    pkg_dir = os.path.dirname(os.path.abspath(janusx_tpu.__file__))
    repo_like = os.path.exists(
        os.path.join(os.path.dirname(pkg_dir), "native"))
    if not check("import janusx_tpu", True, pkg_dir):
        failures += 1
    if repo_like:
        print("NOTE: running against a repo-layout checkout, not a wheel "
              "install — native resolution will prefer the repo tree")

    # native helper resolution: each must either load or report a clean
    # fallback (never raise)
    from janusx_tpu.utils.nativelib import locate

    for name in ("jxio", "jxkmer", "jxbaseline"):
        src, so = locate(name)
        have = os.path.exists(so) or os.path.exists(src)
        if not check(f"native {name} payload present", have, so):
            failures += 1
    try:
        from janusx_tpu.io import native as jxio

        ok = jxio.available() in (True, False)
        if not check("jxio loads or falls back cleanly", ok):
            failures += 1
    except Exception as e:
        check("jxio loads or falls back cleanly", False, repr(e))
        failures += 1

    # CLI entry point
    cp = subprocess.run([sys.executable, "-m", "janusx_tpu.cli.main",
                         "--help"], capture_output=True, text=True)
    if not check("jx CLI --help", cp.returncode == 0,
                 (cp.stderr or cp.stdout).strip()[:120]):
        failures += 1

    # tiny end-to-end: simulate -> gwas lm -> TSV exists (CPU backend)
    with tempfile.TemporaryDirectory() as td:
        env = dict(os.environ, JX_TPU_PLATFORM="cpu")
        cp = subprocess.run(
            [sys.executable, "-m", "janusx_tpu.cli.main", "sim",
             "-nind", "120", "-nsnp", "500", "-seed", "1",
             "-o", td, "-prefix", "simpanel"],
            capture_output=True, text=True, env=env)
        ok = cp.returncode == 0
        if ok:
            bfile = os.path.join(td, "simpanel")
            cp2 = subprocess.run(
                [sys.executable, "-m", "janusx_tpu.cli.main", "gwas",
                 "-bfile", bfile, "-p", bfile + ".pheno", "-lm",
                 "-force-model", "-o", os.path.join(td, "out")],
                capture_output=True, text=True, env=env)
            ok = cp2.returncode == 0 and any(
                f.endswith(".assoc.tsv")
                for f in os.listdir(os.path.join(td, "out")))
            detail = (cp2.stderr or "").strip()[-200:] if not ok else ""
        else:
            detail = (cp.stderr or "").strip()[-200:]
        if not check("sim + gwas -lm end-to-end", ok, detail):
            failures += 1

    print(f"{'OK' if failures == 0 else 'FAILED'}: "
          f"{failures} failure(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
