"""scripts/benchmark_external.sh: skip-path + jx-leg validation.

The external tools (GEMMA/GCTA/rMVP/BGLR/REGENIE) don't exist in this
environment, so the driver must (a) run the jx leg end-to-end, (b) mark
every absent tool `skipped` in status.tsv without failing, and (c) emit
the parity table header via scripts/compare_assoc.py — ready to produce
real parity rows wherever the tools exist
(reference: /root/reference/scripts/benchmark.sh:25-44).
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_driver_skip_path_and_jx_leg(tmp_path):
    env = dict(os.environ, OUT_DIR=str(tmp_path), SIM_N="120", SIM_M="800",
               JX_TPU_PLATFORM="cpu")
    cp = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "benchmark_external.sh"),
         "gwas-lmm"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=400)
    assert cp.returncode == 0, cp.stdout[-2000:] + cp.stderr[-2000:]
    status = dict(
        line.split("\t")[:2]
        for line in open(tmp_path / "results" / "status.tsv").read().splitlines()
    )
    assert status["sim"] == "ok" and status["jx_gwas_lmm"] == "ok", status
    for tool in ("gemma", "gcta", "rmvp", "regenie"):
        assert status.get(tool) in ("skipped", "ok"), status
    # jx produced a real association TSV and the parity table has a header
    jx_tsvs = [f for f in os.listdir(tmp_path / "results" / "jx")
               if f.endswith(".assoc.tsv")]
    assert jx_tsvs
    parity = open(tmp_path / "results" / "parity.tsv").read().splitlines()
    assert parity[0].startswith("tool_a\ttool_b")
    # logs + (when /usr/bin/time -v exists) time profiles were archived
    assert os.path.exists(tmp_path / "logs" / "jx_gwas_lmm.log")


def test_compare_assoc_pairs(tmp_path):
    """compare_assoc.py joins two tool outputs on SNP id and reports the
    parity statistics correctly (synthetic fixtures standing in for a
    GEMMA run)."""
    jx_dir = tmp_path / "jx"
    jx_dir.mkdir()
    gemma_dir = tmp_path / "gemma"
    gemma_dir.mkdir()
    rng = np.random.default_rng(3)
    p = rng.uniform(1e-9, 1.0, 50)
    with open(jx_dir / "jx.t.LMM.assoc.tsv", "w") as fh:
        fh.write("chrom\tpos\tsnp\tbeta\tpwald\n")
        for i, pv in enumerate(p):
            fh.write(f"1\t{i}\ts{i}\t0.1\t{pv:.6e}\n")
    with open(gemma_dir / "assoc.assoc.txt", "w") as fh:
        fh.write("chr\trs\tps\tp_wald\n")
        for i, pv in enumerate(p):
            fh.write(f"1\ts{i}\t{i}\t{pv * (1 + 1e-6):.6e}\n")
    cp = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "compare_assoc.py"),
         str(tmp_path)],
        capture_output=True, text=True, timeout=60)
    assert cp.returncode == 0, cp.stderr
    lines = cp.stdout.strip().splitlines()
    row = dict(zip(lines[0].split("\t"), lines[1].split("\t")))
    assert row["tool_a"] == "jx" and row["tool_b"] == "gemma"
    assert int(row["n_shared"]) == 50
    assert float(row["pearson_neglogp"]) > 0.999999
    assert float(row["max_dlogp"]) < 1e-5
    assert row["tophit_match"] == "yes"
