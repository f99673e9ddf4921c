"""Seeded fuzz regression tests for the IO layer.

Contract: every reader confronted with truncated, byte-corrupted, or junk
input must either parse it or raise a clean, catchable error (ValueError /
OSError / EOF-style) — never an internal exception (IndexError, KeyError,
TypeError, ...) and never a hard crash. Two fuzz-found round-4 bugs are
pinned explicitly:

- HapMap rows with fewer columns than the header raised a bare IndexError
  (io/hapmap.py row-width validation).
- `.jxgrm` files with corrupted CSC structure (out-of-range row indices /
  non-monotonic col_ptr) were handed to scipy.sparse.csc_matrix, which
  does not validate — the first symmetrize then SEGFAULTED inside
  scipy's C kernels (io/jxgrm.py structure validation).

The reference's analogous surface is the mmap validation in
/root/reference/src/math/cholesky.rs:283-345 and the malformed-input
errors of src/io/gfcore.rs.
"""

import gzip

import numpy as np
import pytest
import scipy.sparse as sp

from janusx_tpu.io.bin01 import Bin01Writer, read_bin01
from janusx_tpu.io.gfreader import inspect_genotype_file, load_raw_packed
from janusx_tpu.io.hapmap import read_hapmap
from janusx_tpu.io.jxgrm import read_jxgrm, write_jxgrm
from janusx_tpu.io.pheno import load_phenotype

# exception types that count as "clean": deliberate validation or IO errors
CLEAN = (ValueError, OSError, EOFError, RuntimeError, gzip.BadGzipFile)
# internal exceptions = bugs
BAD = (IndexError, KeyError, UnboundLocalError, AttributeError, TypeError,
       ZeroDivisionError, RecursionError, StopIteration, SystemError,
       MemoryError)

VCF = (b"##fileformat=VCFv4.2\n"
       b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2\ts3\n"
       b"1\t100\tv1\tA\tG\t.\t.\t.\tGT\t0/0\t0/1\t1/1\n"
       b"1\t200\tv2\tT\tC\t.\t.\t.\tGT\t0/1\t./.\t1|1\n")
HMP = (b"rs#\talleles\tchrom\tpos\tstrand\tassembly#\tcenter\tprotLSID\t"
       b"assayLSID\tpanelLSID\tQCcode\ts1\ts2\ts3\n"
       b"v1\tA/G\t1\t100\t+\tNA\tNA\tNA\tNA\tNA\tNA\tAA\tAG\tGG\n"
       b"v2\tT/C\t1\t200\t+\tNA\tNA\tNA\tNA\tNA\tNA\tTC\tNN\tCC\n")
TXT = b"id\ts1\ts2\ts3\nv1\t0\t1\t2\nv2\t1\tNA\t2\n"
PHE = b"id\tt1\tt2\ns1\t1.0\t2.0\ns2\tNA\t0.5\ns3\t0.1\t-9\n"


def _attempt(fn, *args):
    try:
        fn(*args)
    except CLEAN:
        pass
    except BAD as e:  # pragma: no cover - only on regression
        raise AssertionError(f"internal exception escaped a reader: {e!r}") from e


def _mutations(data: bytes, rng, n_corrupt: int):
    for cut in range(0, min(len(data), 48)):
        yield data[:cut]
    yield data[: len(data) // 2]
    yield data[:-1]
    for _ in range(n_corrupt):
        buf = bytearray(data)
        for _ in range(rng.integers(1, 6)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        yield bytes(buf)
    for _ in range(8):
        yield rng.integers(0, 256, size=rng.integers(0, 300),
                           dtype=np.uint8).tobytes()


@pytest.mark.parametrize("ext,data,gz", [
    (".vcf", VCF, False),
    (".vcf.gz", VCF, True),
    (".hmp.txt", HMP, False),
    (".txt", TXT, False),
])
def test_genotype_readers_survive_mutation(tmp_path, ext, data, gz):
    rng = np.random.default_rng(20260820)
    p = str(tmp_path / f"f{ext}")
    for i, mut in enumerate(_mutations(data, rng, n_corrupt=40)):
        payload = gzip.compress(mut) if gz else mut
        with open(p, "wb") as fh:
            fh.write(payload)
        _attempt(inspect_genotype_file, p)
        _attempt(load_raw_packed, p)


def test_hapmap_short_row_is_clean_error(tmp_path):
    """Fuzz-found: a data row narrower than the header must raise
    ValueError naming the row, not IndexError."""
    p = str(tmp_path / "x.hmp.txt")
    with open(p, "wb") as fh:
        fh.write(HMP.splitlines()[0] + b"\n")
        fh.write(b"v1\tA/G\t1\t100\t+\tNA\tNA\tNA\tNA\tNA\tNA\tAA\n")  # 1 of 3
    with pytest.raises(ValueError, match="malformed HapMap row"):
        read_hapmap(p)
    with open(p, "ab") as fh:
        fh.write(b"v2\tT/C\t1\txx\t+\tNA\tNA\tNA\tNA\tNA\tNA\tTC\tNN\tCC\n")
    with pytest.raises(ValueError, match="malformed HapMap row"):
        read_hapmap(p)


def test_jxgrm_corrupt_structure_is_clean_error(tmp_path):
    """Fuzz-found segfault: corrupted row indices / col_ptr must be
    rejected BEFORE scipy.sparse sees them."""
    K = sp.random(6, 6, density=0.5, random_state=0, format="csc")
    K = (K + K.T).tocsc()
    p = str(tmp_path / "k.jxgrm")
    write_jxgrm(p, K)
    data = bytearray(open(p, "rb").read())

    nnz = int(np.frombuffer(bytes(data[8:16]), "<u8")[0])
    row_off = 16 + 7 * 8
    # out-of-range row index
    bad = bytearray(data)
    bad[row_off:row_off + 4] = np.array([999], "<u4").tobytes()
    with open(p, "wb") as fh:
        fh.write(bytes(bad))
    with pytest.raises(ValueError, match="corrupt row indices"):
        read_jxgrm(p)
    # non-monotonic col_ptr (keep col_ptr[-1] == nnz so we reach the check)
    bad = bytearray(data)
    bad[16 + 8:16 + 16] = np.array([nnz], "<u8").tobytes()  # col_ptr[1]=nnz
    with open(p, "wb") as fh:
        fh.write(bytes(bad))
    with pytest.raises(ValueError, match="col_ptr"):
        read_jxgrm(p)
    # random corruption sweep: parse or clean error, never a crash
    rng = np.random.default_rng(7)
    for _ in range(120):
        buf = bytearray(data)
        for _ in range(rng.integers(1, 5)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        with open(p, "wb") as fh:
            fh.write(bytes(buf))
        _attempt(read_jxgrm, p)


def test_bim_short_row_is_clean_error(tmp_path):
    """Fuzz-found: .bim rows with <6 columns raised bare IndexError."""
    from janusx_tpu.io.plink import read_bim

    p = str(tmp_path / "a.bim")
    with open(p, "wt") as fh:
        fh.write("1\tv1\t0\t100\tA\tG\n1\tv2\t0\t200\n")
    with pytest.raises(ValueError, match="malformed .bim row"):
        read_bim(p)
    with open(p, "wt") as fh:
        fh.write("1\tv1\t0\tzz\tA\tG\n")
    with pytest.raises(ValueError, match="non-integer bp"):
        read_bim(p)


def test_windowed_plink_triple_survives_mutation(tmp_path):
    """WindowedBed over corrupted/truncated .bed/.bim/.fam members."""
    from janusx_tpu.io import plink
    from janusx_tpu.io.packed import QcParams
    from janusx_tpu.io.windowed import WindowedBed

    rng = np.random.default_rng(11)
    bed = plink.BED_MAGIC + bytes(rng.integers(0, 256, size=2, dtype=np.uint8))
    bim = b"1\tv1\t0\t100\tA\tG\n1\tv2\t0\t200\tT\tC\n"
    fam = b"s1 s1 0 0 0 -9\ns2 s2 0 0 0 -9\ns3 s3 0 0 0 -9\n"
    prefix = str(tmp_path / "a")

    def write(b, bi, fa):
        for ext, data in ((".bed", b), (".bim", bi), (".fam", fa)):
            with open(prefix + ext, "wb") as fh:
                fh.write(data)

    def attempt():
        try:
            wp = WindowedBed(prefix).prepare(QcParams())
            wp.take_snps(np.arange(wp.m))
        except CLEAN:
            pass
        except BAD as e:  # pragma: no cover
            raise AssertionError(f"internal exception: {e!r}") from e

    for _ in range(120):
        b2, bi, fa = bytearray(bed), bytearray(bim), bytearray(fam)
        arr = (b2, bi, fa)[rng.integers(0, 3)]
        for _ in range(rng.integers(1, 4)):
            arr[rng.integers(0, len(arr))] = rng.integers(0, 256)
        write(bytes(b2), bytes(bi), bytes(fa))
        attempt()
    for cut in range(len(bim)):
        write(bed, bim[:cut], fam)
        attempt()
    for cut in range(len(bed)):
        write(bed[:cut], bim, fam)
        attempt()


def test_bin01_and_pheno_survive_mutation(tmp_path):
    rng = np.random.default_rng(3)
    p = str(tmp_path / "a.bin")
    w = Bin01Writer(p, 5, site_mode="tsv")
    G = (rng.random((8, 5)) < 0.4).astype(np.uint8)
    w.write_rows(G, [("1", i + 1, "A", "G") for i in range(8)])
    (w.finish() if hasattr(w, "finish") else w.close())
    data = open(p, "rb").read()
    for mut in _mutations(data, rng, n_corrupt=60):
        with open(p, "wb") as fh:
            fh.write(mut)
        _attempt(read_bin01, p)

    q = str(tmp_path / "p.tsv")
    for mut in _mutations(PHE, rng, n_corrupt=40):
        with open(q, "wb") as fh:
            fh.write(mut)
        _attempt(load_phenotype, q)


def test_vcf_ragged_line_is_loud_error(tmp_path):
    """A data line with missing genotype columns must raise, not parse
    uninitialized garbage dosages (round-5 review finding)."""
    from janusx_tpu.io.vcf import read_vcf

    p = tmp_path / "r.vcf"
    p.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2\ts3\n"
        "1\t100\trs1\tA\tG\t.\t.\t.\tGT\t0/0\t0/1\n"  # 2 cells, 3 samples
    )
    with pytest.raises(ValueError, match="expected 12"):
        read_vcf(str(p))


def test_vcf_blank_lines_skipped(tmp_path):
    """Trailing/blank lines are not variant records: parsing skips them
    and count_vcf_sites does not count them."""
    from janusx_tpu.io.vcf import count_vcf_sites, read_vcf

    p = tmp_path / "b.vcf"
    p.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2\n"
        "1\t100\trs1\tA\tG\t.\t.\t.\tGT\t0/0\t0/1\n"
        "\n"
        "1\t200\trs2\tC\tT\t.\t.\t.\tGT\t1/1\t./.\n"
        "\n"
    )
    gd = read_vcf(str(p))
    assert gd.m == 2
    assert count_vcf_sites(str(p)) == 2
    np.testing.assert_array_equal(gd.genotypes[1], [2, -1])


def test_packed_concat_rejects_different_cohorts(rng):
    """concat with equal sample COUNTS but different sample IDs is a
    loud error (silently misaligned columns otherwise)."""
    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.io.packed import PackedGenotypes, QcParams, pack_genotypes

    def panel(tag):
        m, n = 20, 8
        g = rng.integers(0, 3, size=(m, n)).astype(np.int8)
        sites = SiteInfo(
            chrom=np.array(["1"] * m, object),
            pos=np.arange(1, m + 1, dtype=np.int64),
            snp=np.array([f"{tag}{i}" for i in range(m)], object),
            allele0=np.array(["A"] * m, object),
            allele1=np.array(["G"] * m, object),
        )
        gd = GenotypeData(g, sites,
                          np.array([f"{tag}_{j}" for j in range(n)], object))
        return pack_genotypes(gd, QcParams(maf=0.0, geno=1.0))

    a, b = panel("a"), panel("b")
    with pytest.raises(ValueError, match="sample ID"):
        PackedGenotypes.concat([a, b])
    assert PackedGenotypes.concat([a, a]).m == 2 * a.m
