# rMVP MLM leg of scripts/benchmark_external.sh
# usage: Rscript rmvp_mlm.R <plink_prefix> <pheno_tsv> <out_dir>
# (runs only where rMVP is installed; the driver skips otherwise)
args <- commandArgs(trailingOnly = TRUE)
prefix <- args[1]; pheno <- args[2]; out <- args[3]
dir.create(out, showWarnings = FALSE, recursive = TRUE)
library(rMVP)
MVP.Data(fileBed = prefix, filePhe = pheno, sep.phe = "\t",
         out = file.path(out, "mvp"))
geno <- attach.big.matrix(file.path(out, "mvp.geno.desc"))
phe <- read.table(file.path(out, "mvp.phe"), header = TRUE)
map <- read.table(file.path(out, "mvp.geno.map"), header = TRUE)
res <- MVP(phe = phe[, 1:2], geno = geno, map = map,
           method = "MLM", nPC.MLM = 0, file.output = FALSE)
write.csv(cbind(map, res$mlm.results),
          file.path(out, "rmvp_mlm.csv"), row.names = FALSE)
