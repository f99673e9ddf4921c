"""`jx fvlmm2` — dedicated G×E interaction scan entry point.

Reference: python/janusx/script/fvlmm2.py (standalone module for the
fvlmm2 joint-interaction route). Forwards to `jx gwas -fvlmm2` so both
spellings work; the interaction term is the LAST covariate column."""

from __future__ import annotations


def main(argv=None) -> int:
    import sys

    from janusx_tpu.cli.gwas import main as gwas_main

    args = list(sys.argv[1:] if argv is None else argv)
    if "-fvlmm2" not in args and "--fvlmm2" not in args:
        args = ["-fvlmm2"] + args
    return gwas_main(args)
