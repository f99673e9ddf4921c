"""Mechanical CLI flag-surface audit vs the reference.

Scrapes every literal option string from every reference CLI module's
``add_argument(...)`` calls (AST walk — the reference package is not
importable here) and asserts that the corresponding `jx` parser accepts
each spelling. This machine-checks the drop-in guarantee that COVERAGE.md
used to assert by hand: a reference command line never dies with
"unrecognized arguments".

Reference parser sources: python/janusx/script/*.py,
python/janusx/assoc/workflow.py (jx gwas parse_args :6599),
python/janusx/gs/workflow.py (jx gs), python/janusx/ggval.py.
"""

from __future__ import annotations

import ast
import importlib
import os
import pathlib

import pytest

REF = pathlib.Path("/root/reference/python/janusx")

# our CLI command -> (our module, reference parser file(s))
MODULE_MAP = {
    "gwas": ("janusx_tpu.cli.gwas", ["assoc/workflow.py"]),
    "gs": ("janusx_tpu.cli.gs", ["gs/workflow.py"]),
    "grm": ("janusx_tpu.cli.grm", ["script/grm.py"]),
    "pca": ("janusx_tpu.cli.pca", ["script/pca.py"]),
    "gstats": ("janusx_tpu.cli.gstats", ["script/gstats.py"]),
    "sim": ("janusx_tpu.cli.sim", ["script/sim.py"]),
    "gformat": ("janusx_tpu.cli.gformat", ["script/gformat.py"]),
    "postgwas": ("janusx_tpu.cli.postgwas", ["script/postgwas.py"]),
    "reml": ("janusx_tpu.cli.reml", ["script/reml.py"]),
    "fastpop": ("janusx_tpu.cli.fastpop", ["script/adamixture.py"]),
    "tree": ("janusx_tpu.cli.tree", ["script/tree.py"]),
    "treeplot": ("janusx_tpu.cli.treeplot", ["script/treeplot.py"]),
    "postbsa": ("janusx_tpu.cli.postbsa", ["script/postbsa.py"]),
    "gmerge": ("janusx_tpu.cli.gmerge", ["script/gmerge.py"]),
    "webui": ("janusx_tpu.cli.webui", ["ui/server.py"]),
    "garfield": ("janusx_tpu.cli.garfield", ["script/garfield.py"]),
    "kmer": ("janusx_tpu.cli.kmer", ["script/kmer.py"]),
    "fastq2vcf": ("janusx_tpu.cli.fastq2vcf", ["script/fastq2vcf.py"]),
    "fastq2count": ("janusx_tpu.cli.fastq2count", ["script/fastq2count.py"]),
    "postgs": ("janusx_tpu.cli.postgs", ["script/postgs.py"]),
    "hybrid": ("janusx_tpu.cli.hybrid", ["script/hybrid.py"]),
    "view": ("janusx_tpu.cli.view", ["script/view.py"]),
    "refcheck": ("janusx_tpu.cli.refcheck", ["script/refcheck.py"]),
    "fvlmm2": ("janusx_tpu.cli.fvlmm2", ["script/fvlmm2.py"]),
    "postgarfield": ("janusx_tpu.cli.postgarfield", ["script/postgarfield.py"]),
    "simulation": ("janusx_tpu.cli.sim", ["script/simulation.py"]),
    "benchmark": ("janusx_tpu.cli.benchmark", ["script/benchmark.py"]),
}

# secondary entries whose parsers are built inline in main()
SUBENTRY_MAP = {
    "kmerge": ("janusx_tpu.cli.kmer", "kmerge_main", ["script/kmerge.py"]),
    "kstats": ("janusx_tpu.cli.kmer", "kstats_main", ["script/kstats.py"]),
    "gblupbench": ("janusx_tpu.cli.benchmark", "gblupbench_main",
                   ["script/gblupbench.py"]),
    "bayesbench": ("janusx_tpu.cli.benchmark", "bayesbench_main",
                   ["script/bayesbench.py"]),
    "garfieldbench": ("janusx_tpu.cli.benchmark", "garfieldbench_main",
                      ["script/garfieldbench.py"]),
    "ggval": ("janusx_tpu.cli.ggval", None, ["ggval.py"]),
}

# Flags we deliberately do NOT register, with the reason. Target: keep
# this empty. Anything here is a documented drop-in break.
ALLOW_MISSING: dict[str, set[str]] = {}


def _ref_option_strings(relpaths) -> set[str]:
    opts: set[str] = set()
    for rel in relpaths:
        path = REF / rel
        if not path.exists():
            continue
        tree = ast.parse(path.read_text(errors="replace"))
        for node in ast.walk(tree):
            if not (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "add_argument"):
                continue
            for a in node.args:
                if (isinstance(a, ast.Constant) and isinstance(a.value, str)
                        and a.value.startswith("-")
                        and any(c.isalpha() for c in a.value)):
                    opts.add(a.value)
    return opts


def _parser_option_strings(parser) -> set[str]:
    import argparse

    out = set(parser._option_string_actions)
    for action in parser._actions:
        if isinstance(action, argparse._SubParsersAction):
            for sub in action.choices.values():
                out |= _parser_option_strings(sub)
    return out


def _our_parser(modpath: str):
    mod = importlib.import_module(modpath)
    build = getattr(mod, "build_parser", None)
    if build is None:
        return None
    try:
        return build()
    except TypeError:
        return build(prog=f"jx {modpath.rsplit('.', 1)[-1]}")


class _Captured(Exception):
    pass


def _capture_inline_parser(main_fn):
    """Grab the parser a main() builds inline, without running the tool."""
    import argparse

    captured = []
    orig = argparse.ArgumentParser.parse_args

    def fake(self, args=None, namespace=None):
        captured.append(self)
        raise _Captured()

    argparse.ArgumentParser.parse_args = fake
    try:
        try:
            main_fn([])
        except _Captured:
            pass
    finally:
        argparse.ArgumentParser.parse_args = orig
    assert captured, "main() never called parse_args"
    return captured[0]


@pytest.mark.skipif(not REF.exists(), reason="reference checkout not present")
@pytest.mark.parametrize("cmd", sorted(MODULE_MAP))
def test_no_reference_flag_rejected(cmd):
    modpath, relpaths = MODULE_MAP[cmd]
    ref_opts = _ref_option_strings(relpaths)
    assert ref_opts, f"no option strings scraped for {cmd} — mapping stale?"
    parser = _our_parser(modpath)
    assert parser is not None, f"{modpath} has no build_parser"
    if cmd == "gwas":
        # hidden dev spellings register regardless; the -dev toggle itself
        # is stripped before parse (cli/gwas.py main)
        ours = _parser_option_strings(parser) | {"-dev", "--dev"}
    else:
        ours = _parser_option_strings(parser)
    missing = ref_opts - ours - ALLOW_MISSING.get(cmd, set())
    assert not missing, (
        f"jx {cmd} rejects reference flags: {sorted(missing)}"
    )


@pytest.mark.skipif(not REF.exists(), reason="reference checkout not present")
@pytest.mark.parametrize("cmd", sorted(SUBENTRY_MAP))
def test_no_reference_flag_rejected_subentries(cmd):
    modpath, fn_name, relpaths = SUBENTRY_MAP[cmd]
    ref_opts = _ref_option_strings(relpaths)
    if not ref_opts:
        pytest.skip(f"reference has no parser file for {cmd}")
    mod = importlib.import_module(modpath)
    if fn_name is None:
        parser = _our_parser(modpath)
    else:
        parser = _capture_inline_parser(getattr(mod, fn_name))
    ours = _parser_option_strings(parser)
    missing = ref_opts - ours - ALLOW_MISSING.get(cmd, set())
    assert not missing, (
        f"jx {cmd} rejects reference flags: {sorted(missing)}"
    )


def test_gs_ladder_parses_reference_command_lines():
    """The exact command shapes VERDICT r3 flagged as argparse-rejecting."""
    from janusx_tpu.cli.gs import build_parser

    p = build_parser()
    args = p.parse_args(
        "-bfile x -p y --rrblup-epochs 5 --rrblup-lr 0.01 --rrblup-beta1 0.9 "
        "--rrblup-beta2 0.999 --rrblup-es-patience 3 --rrblup-grid-size 2 "
        "--rrblup-seed 7 --rrblup-pve-mode trainvar --model-select global "
        "--packed-lmm-auto off --bayes-r2-cv-reuse off "
        "--bayes-r2-subsample-n 500 --top-epochs 9 --top-lr 0.1 "
        "--top-mode minibatch-adam --top-calibration none "
        "--rrblup-pcg-max-iter 64 --rrblup-lambda-scale equation".split()
    )
    assert args.rrblup_epochs == 5
    assert args.rrblup_pcg_maxiter == 64
    assert args.model_select == "global"
    assert args.rrblup_lambda_scale == "equation"


def test_gs_compat_flags_warn_not_silent(caplog):
    """Explicitly-set no-analog flags must produce a warning log line."""
    import logging

    from janusx_tpu.cli import common
    from janusx_tpu.cli.gs import build_parser

    p = build_parser()
    args = p.parse_args("-bfile x -p y --rrblup-epochs 5".split())
    log = logging.getLogger("janusx_tpu.gs")
    with caplog.at_level(logging.WARNING, logger="janusx_tpu.gs"):
        n = common.warn_ignored_compat(p, args, log)
    assert n == 1
    assert "--rrblup-epochs" in caplog.text and "IGNORED" in caplog.text


def test_farmcpu_nbin_validation_and_grid():
    from janusx_tpu.cli.gwas import build_parser
    from janusx_tpu.models.farmcpu import _lead_count_grid

    p = build_parser()
    args = p.parse_args("-bfile x -p y -farmcpu --farmcpu-nbin 3".split())
    assert args.farmcpu_nbin == 3
    # default grid is unchanged: qb=50, nbin=5 -> (10,20,30,40,50)
    assert _lead_count_grid(50, 5) == (10, 20, 30, 40, 50)
    assert _lead_count_grid(50, 3) == (16, 32, 48)
    assert _lead_count_grid(13, 5) == (2, 4, 6, 8, 10, 12)
    assert _lead_count_grid(1, 5) == (1,)
