"""Byte-exact golden-file regression: full mouse_hs1940 assoc TSVs.

Frozen by scripts/freeze_golden_tsv.py on the CPU backend. Any numeric
drift OR output-format drift (column order, float formatting — reference
schemas src/io/assoc2tsv.rs:45-57) in lm/lmm/lmm2/fvlmm/splmm/splmm-exact
fails the diff.
"""

import gzip
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
TAGS = ["LM", "LMM", "LMM2", "FvLMM", "SparseLMM", "SparseLMM2", "LowRank",
        "LM2", "FvLMM2"]


@pytest.fixture(scope="module")
def generated(mouse_vcf, mouse_pheno, tmp_path_factory):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from freeze_golden_tsv import generate

    out = tmp_path_factory.mktemp("golden_regen")
    return generate(str(out))


@pytest.mark.parametrize("tag", TAGS)
def test_golden_tsv_byte_exact(generated, tag):
    golden = os.path.join(GOLDEN_DIR, f"mouse.test0.{tag}.assoc.tsv.gz")
    assert os.path.exists(golden), f"golden missing: {golden}"
    with gzip.open(golden, "rb") as fh:
        want = fh.read()
    with open(generated[tag], "rb") as fh:
        got = fh.read()
    if got != want:
        wl = want.decode().splitlines()
        gl = got.decode().splitlines()
        assert len(gl) == len(wl), f"{tag}: row count {len(gl)} != {len(wl)}"
        ndiff = sum(1 for a, b in zip(wl, gl) if a != b)
        first = next(
            (i, a, b) for i, (a, b) in enumerate(zip(wl, gl)) if a != b
        )
        raise AssertionError(
            f"{tag}: {ndiff}/{len(wl)} lines differ; first at line "
            f"{first[0]}:\n  golden: {first[1]}\n  got:    {first[2]}"
        )
