#!/usr/bin/env bash
# External-tool comparative benchmark driver (VERDICT r4 item 8).
#
# Ports the semantics of the reference's scripts/benchmark.sh
# (/root/reference/scripts/benchmark.sh:25-44): drive the SAME simulated
# panel through janusx-tpu and whichever of GEMMA / GCTA / rMVP / BGLR /
# REGENIE are on PATH, archive every tool's log + /usr/bin/time -v
# profile, and diff the association p-value columns (scripts/
# compare_assoc.py). Tools that are absent are SKIPPED with a recorded
# note — the script always exits 0 on a clean run so it can live in CI
# and produce full parity tables the moment an environment with the
# tools exists.
#
# Modes
#   help      Show this help.
#   versions  Record tool versions found on PATH.
#   gwas-lmm  Simulated single-trait LMM GWAS through every present tool.
#   gs-blup   GBLUP cross-validation: jx vs rrBLUP/BGLR (R, if present).
#   all       versions + gwas-lmm + gs-blup.
#
# Key environment variables
#   OUT_DIR      Output root   (default: ./bench_external)
#   JX_BIN       JanusX launcher (default: "python -m janusx_tpu.cli.main")
#   GEMMA_BIN / GCTA_BIN / REGENIE_BIN / RSCRIPT_BIN
#   THREADS      Thread count hint for external tools (default: 4)
#   SIM_N / SIM_M / SIM_SEED   Panel size (default 1000 x 20000, seed 7)
set -uo pipefail

MODE="${1:-help}"
OUT_DIR="${OUT_DIR:-$(pwd)/bench_external}"
LOG_DIR="${OUT_DIR}/logs"
TIME_DIR="${OUT_DIR}/time"
DATA_DIR="${OUT_DIR}/data"
VERS_DIR="${OUT_DIR}/versions"
RES_DIR="${OUT_DIR}/results"

JX_BIN="${JX_BIN:-python -m janusx_tpu.cli.main}"
GEMMA_BIN="${GEMMA_BIN:-gemma}"
GCTA_BIN="${GCTA_BIN:-gcta64}"
REGENIE_BIN="${REGENIE_BIN:-regenie}"
RSCRIPT_BIN="${RSCRIPT_BIN:-Rscript}"
THREADS="${THREADS:-4}"

SIM_N="${SIM_N:-1000}"
SIM_M="${SIM_M:-20000}"
SIM_SEED="${SIM_SEED:-7}"
SIM_PREFIX="${DATA_DIR}/simpanel"

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"

mkdir -p "${LOG_DIR}" "${TIME_DIR}" "${DATA_DIR}" "${VERS_DIR}" "${RES_DIR}"

log() { printf '[%s] %s\n' "$(date '+%H:%M:%S')" "$*"; }

have() { command -v "$1" >/dev/null 2>&1; }

skip() { # tool label
  log "SKIP ${1}: not found on PATH"
  echo "${1}	skipped	not_found" >>"${RES_DIR}/status.tsv"
}

TIME_TOOL=()
if have gtime; then TIME_TOOL=(gtime -v)
elif [[ -x /usr/bin/time ]] && /usr/bin/time -v true >/dev/null 2>&1; then
  TIME_TOOL=(/usr/bin/time -v)
fi

run_timed() { # label cmd...
  local label="$1"; shift
  local logf="${LOG_DIR}/${label}.log" timef="${TIME_DIR}/${label}.time"
  log "RUN ${label}: $*"
  local rc=0
  if [[ ${#TIME_TOOL[@]} -gt 0 ]]; then
    "${TIME_TOOL[@]}" -o "${timef}" "$@" >"${logf}" 2>&1 || rc=$?
  else
    "$@" >"${logf}" 2>&1 || rc=$?
  fi
  if [[ ${rc} -ne 0 ]]; then
    log "FAIL ${label} (rc=${rc}) — see ${logf}"
    echo "${label}	failed	rc=${rc}" >>"${RES_DIR}/status.tsv"
  else
    echo "${label}	ok	-" >>"${RES_DIR}/status.tsv"
  fi
  return ${rc}
}

record_version() { # label bin
  {
    echo "## $1"
    if have "$2"; then
      echo "path: $(command -v "$2")"
      ("$2" --version || "$2" -v || "$2" --help || true) 2>&1 | sed -n '1,4p'
    else
      echo "not found: $2"
    fi
  } >>"${VERS_DIR}/software_versions.txt"
}

versions() {
  : >"${VERS_DIR}/software_versions.txt"
  echo "date_utc: $(date -u '+%Y-%m-%dT%H:%M:%SZ')" >>"${VERS_DIR}/software_versions.txt"
  record_version janusx-tpu "python"
  ${JX_BIN} --help >"${VERS_DIR}/jx.help.txt" 2>&1 || true
  record_version gemma "${GEMMA_BIN}"
  record_version gcta "${GCTA_BIN}"
  record_version regenie "${REGENIE_BIN}"
  record_version Rscript "${RSCRIPT_BIN}"
  if have "${RSCRIPT_BIN}"; then
    "${RSCRIPT_BIN}" -e 'for (p in c("rMVP","BGLR","rrBLUP")) cat(p, as.character(requireNamespace(p, quietly=TRUE)), "\n")' \
      >>"${VERS_DIR}/software_versions.txt" 2>&1 || true
  fi
  log "versions recorded in ${VERS_DIR}/software_versions.txt"
}

simulate() {
  if [[ -f "${SIM_PREFIX}.bed" ]]; then return 0; fi
  run_timed sim ${JX_BIN} sim -nind "${SIM_N}" -nsnp "${SIM_M}" \
    -seed "${SIM_SEED}" -o "${DATA_DIR}" -prefix simpanel || return 1
  # single-column phenotype table for tools that need one trait
  awk 'NR==1{print "fid\tiid\t"$3; next} {print $1"\t"$2"\t"$3}' \
    "${SIM_PREFIX}.pheno" >"${SIM_PREFIX}.trait1.tsv" 2>/dev/null || true
}

gwas_lmm() {
  simulate || { log "simulation failed"; return 1; }

  # --- janusx (always) ---
  run_timed jx_gwas_lmm ${JX_BIN} gwas -bfile "${SIM_PREFIX}" \
    -p "${SIM_PREFIX}.pheno" -lmm -force-model -n 0 \
    -o "${RES_DIR}/jx" || true

  # --- GEMMA ---
  if have "${GEMMA_BIN}"; then
    ( cd "${RES_DIR}" &&
      run_timed gemma_gk "${GEMMA_BIN}" -bfile "${SIM_PREFIX}" -gk 1 \
        -outdir gemma -o grm &&
      run_timed gemma_lmm "${GEMMA_BIN}" -bfile "${SIM_PREFIX}" \
        -k gemma/grm.cXX.txt -lmm 1 -outdir gemma -o assoc )
  else skip gemma; fi

  # --- GCTA MLMA ---
  if have "${GCTA_BIN}"; then
    run_timed gcta_grm "${GCTA_BIN}" --bfile "${SIM_PREFIX}" \
      --make-grm --thread-num "${THREADS}" --out "${RES_DIR}/gcta_grm" &&
    run_timed gcta_mlma "${GCTA_BIN}" --bfile "${SIM_PREFIX}" \
      --grm "${RES_DIR}/gcta_grm" --mlma \
      --pheno "${SIM_PREFIX}.pheno" --thread-num "${THREADS}" \
      --out "${RES_DIR}/gcta"
  else skip gcta; fi

  # --- rMVP (MLM) ---
  if have "${RSCRIPT_BIN}" && "${RSCRIPT_BIN}" -e 'quit(status=!requireNamespace("rMVP", quietly=TRUE))' >/dev/null 2>&1; then
    run_timed rmvp_mlm "${RSCRIPT_BIN}" "${SCRIPT_DIR}/rmvp_mlm.R" \
      "${SIM_PREFIX}" "${SIM_PREFIX}.pheno" "${RES_DIR}/rmvp"
  else skip rmvp; fi

  # --- REGENIE ---
  if have "${REGENIE_BIN}"; then
    run_timed regenie_s1 "${REGENIE_BIN}" --step 1 --bed "${SIM_PREFIX}" \
      --phenoFile "${SIM_PREFIX}.trait1.tsv" --bsize 1000 --qt \
      --out "${RES_DIR}/regenie_s1" &&
    run_timed regenie_s2 "${REGENIE_BIN}" --step 2 --bed "${SIM_PREFIX}" \
      --phenoFile "${SIM_PREFIX}.trait1.tsv" --bsize 1000 --qt \
      --pred "${RES_DIR}/regenie_s1_pred.list" --out "${RES_DIR}/regenie"
  else skip regenie; fi

  # --- parity table ---
  python "${SCRIPT_DIR}/compare_assoc.py" "${RES_DIR}" \
    >"${RES_DIR}/parity.tsv" 2>"${LOG_DIR}/compare.log" || true
  log "parity table: ${RES_DIR}/parity.tsv"
  cat "${RES_DIR}/parity.tsv" || true
}

gs_blup() {
  simulate || return 1
  run_timed jx_gs_blup ${JX_BIN} gs -bfile "${SIM_PREFIX}" \
    -p "${SIM_PREFIX}.pheno" -BLUP -cv 5 -seed 1 \
    -o "${RES_DIR}/jx_gs" || true
  if have "${RSCRIPT_BIN}" && "${RSCRIPT_BIN}" -e 'quit(status=!requireNamespace("rrBLUP", quietly=TRUE))' >/dev/null 2>&1; then
    run_timed rrblup_cv "${RSCRIPT_BIN}" "${SCRIPT_DIR}/rrblup_cv.R" \
      "${SIM_PREFIX}" "${SIM_PREFIX}.pheno" "${RES_DIR}/rrblup_cv.tsv"
  else skip rrblup; fi
  if have "${RSCRIPT_BIN}" && "${RSCRIPT_BIN}" -e 'quit(status=!requireNamespace("BGLR", quietly=TRUE))' >/dev/null 2>&1; then
    run_timed bglr_cv "${RSCRIPT_BIN}" "${SCRIPT_DIR}/bglr_cv.R" \
      "${SIM_PREFIX}" "${SIM_PREFIX}.pheno" "${RES_DIR}/bglr_cv.tsv"
  else skip bglr; fi
}

case "${MODE}" in
  help|-h|--help) sed -n '2,30p' "$0";;
  versions) versions;;
  gwas-lmm) : >"${RES_DIR}/status.tsv"; gwas_lmm;;
  gs-blup)  : >"${RES_DIR}/status.tsv"; gs_blup;;
  all) : >"${RES_DIR}/status.tsv"; versions; gwas_lmm; gs_blup;;
  *) echo "unknown mode: ${MODE}" >&2; exit 2;;
esac
