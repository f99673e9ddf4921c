"""IO layer tests: codec round-trips, QC semantics, format readers."""

import gzip
import os

import numpy as np
import pytest

from janusx_tpu.io import bitcodec, plink, vcf
from janusx_tpu.io.gdata import GenotypeData, SiteInfo
from janusx_tpu.io.packed import QcParams, pack_genotypes
from janusx_tpu.io.pheno import load_phenotype
from janusx_tpu.io.gfreader import prepare_packed, load_genotype_file


def test_pack_unpack_roundtrip(rng):
    for n in (1, 3, 4, 7, 128, 129):
        codes = rng.integers(0, 4, size=(11, n)).astype(np.uint8)
        packed = bitcodec.pack_codes(codes)
        assert packed.shape == (11, (n + 3) // 4)
        out = bitcodec.unpack_codes(packed, n)
        np.testing.assert_array_equal(out, codes)


def test_row_stats_matches_direct(rng):
    n = 37
    codes = rng.integers(0, 4, size=(20, n)).astype(np.uint8)
    packed = bitcodec.pack_codes(codes)
    nm, alt, het = bitcodec.row_stats(packed, n)
    np.testing.assert_array_equal(nm, (codes != 3).sum(1))
    d = np.where(codes == 3, 0, codes)
    np.testing.assert_array_equal(alt, d.sum(1))
    np.testing.assert_array_equal(het, (codes == 1).sum(1))


def test_flip_lut():
    codes = np.array([[0, 1, 2, 3, 2, 0]], dtype=np.uint8)
    packed = bitcodec.pack_codes(codes)
    flipped = bitcodec.translate(packed, bitcodec.FLIP_LUT)
    out = bitcodec.unpack_codes(flipped, 6)
    np.testing.assert_array_equal(out, [[2, 1, 0, 3, 0, 2]])


def test_qc_flip_and_stats(toy_genotypes):
    pg = pack_genotypes(toy_genotypes, QcParams(maf=0.05, geno=0.05))
    g = toy_genotypes.genotypes
    # recompute expected per original row
    kept = 0
    for i in range(toy_genotypes.m):
        row = g[i]
        obs = row >= 0
        nm = obs.sum()
        miss_rate = 1 - nm / len(row)
        if miss_rate > 0.05 or nm == 0:
            continue
        af = row[obs].sum() / (2 * nm)
        flip = af > 0.5
        maf = min(af, 1 - af)
        if maf < 0.05:
            continue
        d = pg.dosages(kept, kept + 1)[0]
        exp = np.where(row < 0, -1, 2 - row if flip else row)
        np.testing.assert_array_equal(d, exp)
        assert pg.af[kept] == pytest.approx(min(af, 1 - af))
        assert pg.miss[kept] == pytest.approx(miss_rate)
        assert pg.mean[kept] == pytest.approx(2 * min(af, 1 - af))
        kept += 1
    assert kept == pg.m and kept > 0


def test_centered_zero_mean_no_missing(rng):
    g = rng.integers(0, 3, size=(50, 64)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * 50, object),
        pos=np.arange(50, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(50)], object),
        allele0=np.array(["A"] * 50, object),
        allele1=np.array(["C"] * 50, object),
    )
    gd = GenotypeData(g, sites)
    pg = pack_genotypes(gd, QcParams(maf=0.0, geno=1.0))
    c = pg.centered()
    # centered about 2*af (mean dosage)
    assert abs(c.mean()) < 0.5
    d = pg.dosages()
    np.testing.assert_allclose(c, d - pg.mean[:, None], atol=1e-12)


def test_plink_roundtrip(toy_genotypes, tmp_path):
    prefix = str(tmp_path / "toy")
    plink.write_plink_genotypes(prefix, toy_genotypes)
    back = plink.read_plink(prefix)
    np.testing.assert_array_equal(back.genotypes, toy_genotypes.genotypes)
    np.testing.assert_array_equal(back.samples, toy_genotypes.samples)
    np.testing.assert_array_equal(back.sites.pos, toy_genotypes.sites.pos)
    np.testing.assert_array_equal(back.sites.allele1, toy_genotypes.sites.allele1)


def test_vcf_reader(tmp_path):
    content = (
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2\ts3\n"
        "1\t100\trs1\tA\tG\t.\t.\t.\tGT\t0/0\t0/1\t1/1\n"
        "1\t200\t.\tC\tT\t.\t.\t.\tGT:DP\t0|1:3\t./.\t1|1:9\n"
        "2\t300\trs3\tG\tA\t.\t.\t.\tGT\t1/1\t1/1\t0/1\n"
    )
    path = tmp_path / "toy.vcf.gz"
    with gzip.open(path, "wt") as fh:
        fh.write(content)
    gd = vcf.read_vcf(str(path))
    assert gd.m == 3 and gd.n == 3
    np.testing.assert_array_equal(
        gd.genotypes, [[0, 1, 2], [1, -1, 2], [2, 2, 1]]
    )
    assert gd.sites.snp[1] == "1_200"
    assert list(gd.samples) == ["s1", "s2", "s3"]


def test_mouse_vcf_loads(mouse_vcf):
    pg = prepare_packed(mouse_vcf, QcParams(maf=0.0, geno=1.0))
    assert pg.n == 1940
    assert pg.m > 10000
    # af within [0, 0.5] post flip
    assert pg.af.max() <= 0.5 + 1e-12


def test_pheno_parse(tmp_path):
    path = tmp_path / "p.tsv"
    path.write_text(
        "\ttrait_a\ttrait_b\n"
        "s1\t1.0\t2.0\n"
        "s2\tNA\t4.0\n"
        "s1\t3.0\tNA\n"
    )
    ph = load_phenotype(str(path))
    assert ph.traits == ["trait_a", "trait_b"]
    assert list(ph.samples) == ["s1", "s2"]
    np.testing.assert_allclose(ph.values[0], [2.0, 2.0])  # duplicate avg
    assert np.isnan(ph.values[1, 0]) and ph.values[1, 1] == 4.0


def test_pheno_mouse(mouse_pheno):
    ph = load_phenotype(mouse_pheno)
    assert ph.traits[:2] == ["test0", "test1"]
    assert ph.n == 1940


def test_hapmap_reader(tmp_path):
    header = (
        "rs#\talleles\tchrom\tpos\tstrand\tassembly#\tcenter\tprotLSID\t"
        "assayLSID\tpanelLSID\tQCcode\ts1\ts2\ts3\n"
    )
    rows = (
        "rs1\tA/G\t1\t100\t+\t.\t.\t.\t.\t.\t.\tAA\tAG\tGG\n"
        "rs2\tC/T\t1\t200\t+\t.\t.\t.\t.\t.\t.\tNN\tCT\tTT\n"
    )
    path = tmp_path / "toy.hmp.txt"
    path.write_text(header + rows)
    gd = load_genotype_file(str(path))
    np.testing.assert_array_equal(gd.genotypes, [[0, 1, 2], [-1, 1, 2]])


def test_native_vcf_parser_matches_python(mouse_vcf):
    from janusx_tpu.io import native
    from janusx_tpu.io.gfreader import _load_raw_vcf_native, load_raw_packed
    from janusx_tpu.io import vcf as vcfmod, bitcodec

    if not native.available():
        pytest.skip("native toolchain unavailable")
    raw_native = _load_raw_vcf_native(mouse_vcf, 8192)
    # python reference parse
    gd = vcfmod.read_vcf(mouse_vcf)
    codes = bitcodec.unpack_codes(raw_native.packed, raw_native.n_samples)
    geno = codes.astype(np.int8)
    geno[codes == 3] = -1
    np.testing.assert_array_equal(geno, gd.genotypes)
    np.testing.assert_array_equal(raw_native.sites.pos, gd.sites.pos)
    np.testing.assert_array_equal(raw_native.sites.allele1, gd.sites.allele1)
    np.testing.assert_array_equal(raw_native.samples, gd.samples)


def test_tilde_genotype_cache(tmp_path, monkeypatch, rng):
    monkeypatch.setenv("JANUSX_CACHE_DIR", str(tmp_path / "cache"))
    import gzip as _gzip

    content = (
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2\ts3\ts4\n"
        + "".join(
            f"1\t{100 + i}\trs{i}\tA\tG\t.\t.\t.\tGT\t0/0\t0/1\t1/1\t./.\n"
            for i in range(20)
        )
    )
    src = tmp_path / "toy.vcf.gz"
    with _gzip.open(src, "wt") as fh:
        fh.write(content)
    from janusx_tpu.io.gfreader import load_raw_packed

    r1 = load_raw_packed(str(src))
    cache_files = list((tmp_path / "cache").glob("~toy.*.bed"))
    assert len(cache_files) == 1
    # second load must hit the cache (delete source genotype lines to prove it)
    r2 = load_raw_packed(str(src))
    np.testing.assert_array_equal(r2.packed, r1.packed)
    np.testing.assert_array_equal(r2.samples, r1.samples)
    # reference data dir must never receive cache files
    assert not list(
        __import__("pathlib").Path("/root/reference/example").glob("~*")
    )


def test_async_tsv_writer_error_does_not_deadlock(tmp_path):
    """A writer thread that dies must surface its error to producers instead
    of deadlocking them against the full queue (disk-full scenario)."""
    import time

    from janusx_tpu.utils.tsv import AsyncTsvWriter

    w = AsyncTsvWriter(str(tmp_path / "x.tsv"), "h", queue_depth=2)
    w._fh.close()  # simulate the file handle dying mid-run
    t0 = time.monotonic()
    with pytest.raises(ValueError):
        for _ in range(100):
            w.write("row\n")
    assert time.monotonic() - t0 < 10  # must not hang
    with pytest.raises(ValueError):
        w.close()


def test_vcf_gz_is_bgzf(tmp_path, rng):
    """.vcf.gz output must be BGZF (tabix/bcftools reject plain gzip):
    walk every block validating the BC extra field, BSIZE, CRC, and the
    EOF marker."""
    import struct
    import zlib

    from janusx_tpu.io.gdata import GenotypeData, SiteInfo
    from janusx_tpu.io.vcf import read_vcf
    from janusx_tpu.io.writers import write_vcf

    m, n = 2000, 60  # multiple 64K blocks
    g = rng.binomial(2, 0.4, size=(m, n)).astype(np.int8)
    sites = SiteInfo(
        chrom=np.array(["1"] * m, object), pos=np.arange(1, m + 1, dtype=np.int64),
        snp=np.array([f"s{i}" for i in range(m)], object),
        allele0=np.array(["A"] * m, object), allele1=np.array(["G"] * m, object),
    )
    path = str(tmp_path / "t.vcf.gz")
    write_vcf(path, GenotypeData(g, sites, np.array([f"i{j}" for j in range(n)], object)))
    raw = open(path, "rb").read()
    off, out = 0, b""
    while off < len(raw):
        assert raw[off:off + 4] == b"\x1f\x8b\x08\x04"
        xlen = struct.unpack("<H", raw[off + 10:off + 12])[0]
        ext = raw[off + 12:off + 12 + xlen]
        assert ext[:4] == b"BC\x02\x00"
        bsize = struct.unpack("<H", ext[4:6])[0] + 1
        payload = zlib.decompress(raw[off + 12 + xlen:off + bsize - 8], -15)
        crc, isize = struct.unpack("<II", raw[off + bsize - 8:off + bsize])
        assert crc == zlib.crc32(payload) and isize == len(payload)
        out += payload
        off += bsize
    assert off == len(raw)
    assert raw.endswith(bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000"))
    np.testing.assert_array_equal(read_vcf(path).genotypes, g)
