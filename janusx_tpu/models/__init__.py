"""Analysis models: GRM/PCA, GWAS scans (lm/lmm/fvlmm/splmm/farmcpu),
genomic selection (GBLUP/rrBLUP/Bayes/ML)."""
