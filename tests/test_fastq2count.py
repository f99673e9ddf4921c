"""fastq2count pipeline: sample discovery, FPKM/TPM math, step wiring.

Reference: /root/reference/src/workflow/fastq2count/ (fastp -> hisat2
index/align -> featureCounts + FPKM/TPM normalization)."""

import os

import numpy as np
import pytest

from janusx_tpu.pipeline.executor import PipelineOptions
from janusx_tpu.pipeline.fastq2count import (
    Fastq2CountConfig,
    build_pipelines,
    discover_samples,
    fpkm_tpm_from_featurecounts,
    infer_samples_from_bam,
    run,
)


def test_discover_samples_pairing(tmp_path):
    # mixed naming styles, nested dirs, an unpaired file, a non-fastq file
    (tmp_path / "sub").mkdir()
    for nm in (
        "A_1.fq.gz", "A_2.fq.gz",
        "B_R1.fastq.gz", "B_R2.fastq.gz",
        "sub/C.R1.fastq", "sub/C.R2.fastq",
        "lonely_1.fq.gz",           # mate missing -> dropped
        "notes.txt",                # not fastq -> ignored
    ):
        (tmp_path / nm).write_text("x")
    samples = discover_samples(str(tmp_path))
    assert [s["id"] for s in samples] == ["A", "B", "C"]
    for s in samples:
        assert s["fq1"].endswith(("_1.fq.gz", "_R1.fastq.gz", ".R1.fastq"))
        assert s["fq2"].endswith(("_2.fq.gz", "_R2.fastq.gz", ".R2.fastq"))


def test_discover_samples_duplicate_mate_errors(tmp_path):
    (tmp_path / "X_1.fq").write_text("x")
    (tmp_path / "X_R1.fastq").write_text("x")  # same sample key, second R1
    with pytest.raises(ValueError, match="Duplicate"):
        discover_samples(str(tmp_path))


def test_infer_samples_from_bam(tmp_path):
    (tmp_path / "s1.bam").write_text("")
    (tmp_path / "s1.bam.bai").write_text("")
    (tmp_path / "s2.bam").write_text("")
    assert [s["id"] for s in infer_samples_from_bam(str(tmp_path))] == ["s1", "s2"]


def test_fpkm_tpm_math(tmp_path):
    counts = tmp_path / "gene_counts.txt"
    counts.write_text(
        "# featureCounts v2 command line\n"
        "Geneid\tChr\tStart\tEnd\tStrand\tLength\t/w/04_mapping/s1.bam\t/w/04_mapping/s2.bam\n"
        "g1\t1\t1\t1000\t+\t1000\t100\t0\n"
        "g2\t1\t1\t500\t+\t500\t50\t200\n"
        "g3\t2\t1\t2000\t+\t2000\t850\t800\n"
    )
    fpkm_p, tpm_p = str(tmp_path / "f.tsv"), str(tmp_path / "t.tsv")
    fpkm_tpm_from_featurecounts(str(counts), fpkm_p, tpm_p)

    C = np.array([[100.0, 0.0], [50.0, 200.0], [850.0, 800.0]])
    L = np.array([1000.0, 500.0, 2000.0])[:, None]
    fpkm_ref = C * 1e9 / (L * C.sum(axis=0, keepdims=True))
    rpk = C / L
    tpm_ref = rpk * 1e6 / rpk.sum(axis=0, keepdims=True)

    def load(path):
        with open(path) as fh:
            header = fh.readline().rstrip("\n").split("\t")
            rows = [ln.rstrip("\n").split("\t") for ln in fh]
        return header, rows

    header, rows = load(fpkm_p)
    assert header == ["Geneid", "s1", "s2"]
    got = np.array([[float(v) for v in r[1:]] for r in rows])
    np.testing.assert_allclose(got, fpkm_ref, rtol=1e-5)
    _, rows = load(tpm_p)
    got = np.array([[float(v) for v in r[1:]] for r in rows])
    np.testing.assert_allclose(got, tpm_ref, rtol=1e-5)
    # TPM columns sum to 1e6 by construction
    np.testing.assert_allclose(got.sum(axis=0), [1e6, 1e6], rtol=1e-6)


def test_pipeline_wiring_and_step_range(tmp_path):
    cfg = Fastq2CountConfig(
        ref_fasta="ref.fa", annotation="ann.gtf", workdir=str(tmp_path),
        samples=[{"id": "s1", "fq1": "s1_1.fq", "fq2": "s1_2.fq"},
                 {"id": "s2", "fq1": "s2_1.fq", "fq2": "s2_2.fq"}],
        strandness="RF",
        options=PipelineOptions(dry_run=True),
    )
    stages = build_pipelines(cfg)
    assert [no for no, _ in stages] == [1, 2, 3, 4]
    clean, index, align, count = (p for _, p in stages)
    # per-sample stages carry both samples; cohort stages one pseudo-item
    assert len(clean.items) == 2 and len(index.items) == 1
    assert len(align.items) == 2 and len(count.items) == 1
    c_align = align.steps[0].command(cfg.samples[0])
    assert "hisat2 " in c_align and "--rna-strandness RF" in c_align
    assert "samtools sort" in c_align and "samtools index" in c_align
    c_count = count.steps[0].command({"id": "cohort"})
    assert "featureCounts" in c_count and "-t exon" in c_count
    assert "s1.bam" in c_count and "s2.bam" in c_count
    assert "janusx_tpu.pipeline.fastq2count" in c_count  # FPKM/TPM stage
    c_index = index.steps[0].command({"id": "cohort"})
    assert "hisat2-build" in c_index and "reference.index.ok" in c_index

    # dry-run honors the -from-step/-to-step slice
    reports = run(cfg, from_step=2, to_step=3)
    assert set(reports) == {"index", "align"}


def test_cli_dry_run(tmp_path):
    from janusx_tpu.cli.fastq2count import main

    fq = tmp_path / "fq"
    fq.mkdir()
    (fq / "s1_1.fq.gz").write_text("x")
    (fq / "s1_2.fq.gz").write_text("x")
    wd = tmp_path / "wd"
    rc = main([
        "-i", str(fq), "-r", "ref.fa", "-a", "ann.gtf", "-w", str(wd),
        "-dry-run",
    ])
    assert rc == 0
