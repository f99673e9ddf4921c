# rrBLUP 5-fold GBLUP CV leg of scripts/benchmark_external.sh
# usage: Rscript rrblup_cv.R <plink_prefix> <pheno_tsv> <out_tsv>
args <- commandArgs(trailingOnly = TRUE)
prefix <- args[1]; phenof <- args[2]; out <- args[3]
library(rrBLUP)
# minimal .bed reader via genio if present, else plink --recode A expected
if (requireNamespace("genio", quietly = TRUE)) {
  g <- genio::read_plink(prefix)
  X <- t(g$X) - 1  # {-1,0,1}
} else {
  raw <- read.table(paste0(prefix, ".raw"), header = TRUE)
  X <- as.matrix(raw[, -(1:6)]) - 1
}
ph <- read.table(phenof, header = TRUE)
y <- ph[[3]]
set.seed(1)
fold <- sample(rep(1:5, length.out = length(y)))
pred <- rep(NA_real_, length(y))
K <- A.mat(X)
for (f in 1:5) {
  ytr <- y; ytr[fold == f] <- NA
  fit <- kin.blup(data.frame(gid = seq_along(y), y = ytr),
                  geno = "gid", pheno = "y", K = K)
  pred[fold == f] <- fit$g[fold == f]
}
r <- cor(pred, y, use = "complete.obs")
writeLines(sprintf("tool\tcv_pearson\nrrBLUP\t%.6f", r), out)
