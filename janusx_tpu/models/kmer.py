"""K-mer counting and k-mer presence/absence genotype matrices.

Replaces the reference's KMC-based k-mer pipeline
(/root/reference/src/kmer/ + vendored KMC: count per sample, merge to a
0/1 presence matrix usable as a genotype input for GWAS/GS). The counter
is our own compact C++ hash kernel (native/jxkmer.cpp, ctypes-loaded).
"""

from __future__ import annotations

import ctypes
import gzip
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native", "jxkmer.cpp"
)
_SO = os.path.join(os.path.dirname(_SRC), "libjxkmer.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.jx_kmer_count.restype = ctypes.c_void_p
            lib.jx_kmer_count.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_int]
            lib.jx_kmer_table_size.restype = ctypes.c_long
            lib.jx_kmer_table_size.argtypes = [ctypes.c_void_p]
            lib.jx_kmer_export.restype = ctypes.c_long
            lib.jx_kmer_export.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_long,
                ctypes.c_uint32,
            ]
            lib.jx_kmer_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _read_seq_file(path: str) -> bytes:
    if str(path).endswith(".gz"):
        with gzip.open(path, "rb") as fh:
            return fh.read()
    with open(path, "rb") as fh:
        return fh.read()


def count_kmers(path: str, k: int = 21, min_count: int = 1):
    """Count canonical k-mers of one FASTA/FASTQ(.gz) file.

    Returns (codes uint64 sorted, counts uint32)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native k-mer counter unavailable (no g++?)")
    data = _read_seq_file(path)
    tbl = lib.jx_kmer_count(data, len(data), k)
    if not tbl:
        raise RuntimeError("k-mer counting failed")
    try:
        n = lib.jx_kmer_table_size(tbl)
        keys = np.empty(n, np.uint64)
        cnts = np.empty(n, np.uint32)
        w = lib.jx_kmer_export(
            tbl,
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            cnts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            n,
            min_count,
        )
    finally:
        lib.jx_kmer_free(tbl)
    keys, cnts = keys[:w], cnts[:w]
    order = np.argsort(keys)
    return keys[order], cnts[order]


def decode_kmer(code: int, k: int) -> str:
    return "".join("ACGT"[(int(code) >> (2 * (k - 1 - i))) & 3] for i in range(k))


def merge_to_matrix(per_sample: dict, min_samples: int = 2, max_samples=None):
    """Merge per-sample k-mer sets into a presence/absence matrix.

    per_sample: {sample_id: (codes, counts)}. Keeps k-mers present in
    [min_samples, max_samples] samples (segregating). Returns
    (codes (m,), matrix (m, n) int8, sample_ids)."""
    samples = list(per_sample.keys())
    n = len(samples)
    max_samples = n - 1 if max_samples is None else max_samples
    all_codes = np.unique(np.concatenate([per_sample[s][0] for s in samples]))
    mat = np.zeros((len(all_codes), n), np.int8)
    for j, s in enumerate(samples):
        codes = per_sample[s][0]
        idx = np.searchsorted(all_codes, codes)
        mat[idx, j] = 1
    presence = mat.sum(axis=1)
    keep = (presence >= min_samples) & (presence <= max_samples)
    return all_codes[keep], mat[keep], np.array(samples, dtype=object)


def kmer_matrix_to_genotypes(codes: np.ndarray, mat: np.ndarray, samples, k: int):
    """Wrap a presence matrix as GenotypeData (dosage 0/1) for GWAS/GS."""
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo

    m = len(codes)
    sites = SiteInfo(
        chrom=np.array(["K"] * m, object),
        pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([decode_kmer(c, k) for c in codes], object),
        allele0=np.array(["absent"] * m, object),
        allele1=np.array(["present"] * m, object),
    )
    return GenotypeData(mat.astype(np.int8), sites, samples)
