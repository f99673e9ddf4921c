# BGLR (BayesA) 5-fold CV leg of scripts/benchmark_external.sh
# usage: Rscript bglr_cv.R <plink_prefix> <pheno_tsv> <out_tsv>
args <- commandArgs(trailingOnly = TRUE)
prefix <- args[1]; phenof <- args[2]; out <- args[3]
library(BGLR)
if (requireNamespace("genio", quietly = TRUE)) {
  g <- genio::read_plink(prefix)
  X <- t(g$X)
} else {
  raw <- read.table(paste0(prefix, ".raw"), header = TRUE)
  X <- as.matrix(raw[, -(1:6)])
}
ph <- read.table(phenof, header = TRUE)
y <- ph[[3]]
set.seed(1)
fold <- sample(rep(1:5, length.out = length(y)))
pred <- rep(NA_real_, length(y))
for (f in 1:5) {
  ytr <- y; ytr[fold == f] <- NA
  fit <- BGLR(y = ytr, ETA = list(list(X = X, model = "BayesA")),
              nIter = 2000, burnIn = 500, verbose = FALSE)
  pred[fold == f] <- fit$yHat[fold == f]
}
r <- cor(pred, y, use = "complete.obs")
writeLines(sprintf("tool\tcv_pearson\nBGLR_BayesA\t%.6f", r), out)
