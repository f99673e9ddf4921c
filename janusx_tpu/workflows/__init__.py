"""End-to-end analysis workflows (GWAS, GS, GRM/PCA) — the orchestration
layer the CLI and the Python API share."""
