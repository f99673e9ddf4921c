"""Freeze golden full-file GWAS TSVs on mouse_hs1940 (CPU backend).

Generates, for trait test0, the complete association TSV for each scan
model and gzips it into tests/golden/. tests/test_golden_tsv.py re-runs
the same configs under pytest's identical CPU environment and diffs the
files byte-exact, guarding both numerics and output formatting
(reference schemas: src/io/assoc2tsv.rs:45-57).

Run:  python scripts/freeze_golden_tsv.py
"""

import gzip
import os
import shutil
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

# (model, covariates needed). lm2/fvlmm2 need a covariate for the
# interaction term; we use n_pcs=1 so the last PC is the interaction.
MODELS = ["lm", "lmm", "lmm2", "fvlmm", "splmm", "splmm-exact", "lowrank"]
# interaction routes run as a second pass with n_pcs=1 (the PC covariate
# doubles as the G-by-C interaction term)
INTER_MODELS = ["lm2", "fvlmm2"]
TAGS = {
    "lm": "LM", "lmm": "LMM", "lmm2": "LMM2", "fvlmm": "FvLMM",
    "splmm": "SparseLMM", "splmm-exact": "SparseLMM2",
    "lowrank": "LowRank", "lm2": "LM2", "fvlmm2": "FvLMM2",
}


def generate(out_dir: str) -> dict:
    from janusx_tpu.workflows.gwas import GwasConfig, run_gwas

    cfg = GwasConfig(
        genotype="/root/reference/example/mouse_hs1940.vcf.gz",
        phenotype="/root/reference/example/mouse_hs1940.pheno",
        out_prefix=os.path.join(out_dir, "jx"),
        models=tuple(MODELS),
        traits=[0],
        force_model=True,
        use_cache=False,
        n_devices=1,
    )
    runs = run_gwas(cfg)
    out = {TAGS[r.requested_model]: r.tsv_path for r in runs}
    cfg2 = GwasConfig(
        genotype=cfg.genotype,
        phenotype=cfg.phenotype,
        out_prefix=os.path.join(out_dir, "jx2"),
        models=tuple(INTER_MODELS),
        traits=[0],
        n_pcs=1,
        force_model=True,
        use_cache=False,
        n_devices=1,
    )
    for r in run_gwas(cfg2):
        out[TAGS[r.requested_model]] = r.tsv_path
    return out


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        paths = generate(td)
        for tag, path in paths.items():
            dst = os.path.join(GOLDEN_DIR, f"mouse.test0.{tag}.assoc.tsv.gz")
            with open(path, "rb") as fi, gzip.GzipFile(
                dst, "wb", mtime=0
            ) as fo:
                shutil.copyfileobj(fi, fo)
            print(f"frozen: {dst} ({os.path.getsize(dst)} bytes)")


if __name__ == "__main__":
    main()
