"""Build hook: ship the native C++ helpers inside the wheel.

Mirrors the reference's wheel pipeline intent
(/root/reference/.github/workflows/reusable-wheel-build.yml — build the
native core into the distributed artifact, then probe the installed
runtime): at build time the three helper sources (native/jx{io,kmer,
baseline}.cpp) are copied into ``janusx_tpu/_native/`` and compiled with
g++ when a toolchain exists. The runtime loaders
(janusx_tpu/utils/nativelib.py) look in that directory when the repo
``native/`` tree is absent, and every caller keeps its pure-Python
fallback, so a wheel built WITHOUT a toolchain still works (the helpers
rebuild on demand on the install target, or the fallback runs).

Portability note: the wheel build uses plain -O3 (no -march=native) so
the shipped .so runs on any x86-64; the on-demand runtime rebuild uses
-march=native for the extra few percent when a local toolchain exists.
"""

from __future__ import annotations

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.dist import Distribution

NATIVE_HELPERS = {
    "jxio": [],
    "jxkmer": ["-pthread"],
    "jxbaseline": ["-lpthread"],
}


class build_py_with_native(build_py):
    def run(self):
        super().run()
        here = os.path.dirname(os.path.abspath(__file__))
        src_dir = os.path.join(here, "native")
        if not os.path.isdir(src_dir):
            return
        dst_dir = os.path.join(self.build_lib, "janusx_tpu", "_native")
        os.makedirs(dst_dir, exist_ok=True)
        with open(os.path.join(dst_dir, "__init__.py"), "w") as fh:
            fh.write("# native helper payload (see setup.py)\n")
        for name, extra in NATIVE_HELPERS.items():
            cpp = os.path.join(src_dir, f"{name}.cpp")
            if not os.path.exists(cpp):
                continue
            shutil.copy(cpp, dst_dir)
            so = os.path.join(dst_dir, f"lib{name}.so")
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC",
                     os.path.join(dst_dir, f"{name}.cpp"), "-o", so, *extra],
                    check=True, capture_output=True, timeout=300,
                )
                # the loaders rebuild when src is newer than the .so;
                # make sure the shipped pair never looks stale
                os.utime(so, None)
            except Exception as e:  # no toolchain: ship source only
                print(f"[setup.py] native build skipped for {name}: {e}")


class _BinaryDistribution(Distribution):
    """Platform-tag the wheel when it will carry compiled .so payloads
    (a toolchain exists at build time); otherwise stay py3-none-any."""

    def has_ext_modules(self):
        return shutil.which("g++") is not None


setup(cmdclass={"build_py": build_py_with_native},
      distclass=_BinaryDistribution)
