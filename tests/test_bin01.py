"""BIN01 format tests — byte-level parity with the reference layout
(src/io/bincore.rs JXBIN001 header, binwriter.rs LSB-first bit rows,
binsidecar.rs JXBSITE1 k-mer sidecar)."""

import numpy as np
import pytest

from janusx_tpu.io import bin01


def test_bin01_roundtrip_and_layout(tmp_path):
    rng = np.random.default_rng(0)
    m, n = 37, 21
    vals = rng.integers(0, 2, size=(m, n)).astype(np.int8)
    path = str(tmp_path / "mat.bin")
    with bin01.Bin01Writer(path, n) as bw:
        bw.write_rows(vals[:20])
        bw.write_rows(vals[20:])
    bm = bin01.read_bin01(path)
    assert (bm.n_rows, bm.n_samples) == (m, n)
    np.testing.assert_array_equal(bm.dense(), vals)
    # header bytes exactly per bincore.rs:7-32
    blob = open(path, "rb").read()
    assert blob[:8] == b"JXBIN001"
    assert int(np.frombuffer(blob[8:16], "<u8")[0]) == m
    assert int(np.frombuffer(blob[16:24], "<u8")[0]) == n
    assert int(np.frombuffer(blob[24:32], "<u8")[0]) == 0
    # LSB-first bit order (binwriter.rs:236): sample j -> byte j>>3 bit j&7
    row0 = blob[32 : 32 + (n + 7) // 8]
    for j in range(n):
        assert ((row0[j >> 3] >> (j & 7)) & 1) == vals[0, j]


def test_bin01_kmer_sidecar(tmp_path):
    kmers = ["ATCGATCGATCGATCGATCGA", "GATTACAGATTACAGATTACA", "AAAA"]
    n = 10
    vals = np.eye(3, n, dtype=np.int8)
    path = str(tmp_path / "km.bin")
    with bin01.Bin01Writer(path, n, site_mode="kmer") as bw:
        bw.write_rows(vals, kmers)
    bm = bin01.read_bin01(path)
    assert bm.sites() == kmers
    # sidecar header per binsidecar.rs:3-16
    blob = open(bin01.sidecar_path(path), "rb").read()
    assert blob[:8] == b"JXBSITE1"
    assert int(np.frombuffer(blob[8:16], "<u8")[0]) == 3
    # 2-bit codes A=0 T=1 C=2 G=3 LSB-first pairs (binwriter.rs:385)
    assert int(np.frombuffer(blob[24:26], "<u2")[0]) == 21
    first = blob[26]
    assert first == (0 | (1 << 2) | (2 << 4) | (3 << 6))  # "ATCG"


def test_bin01_tsv_sidecar_and_samples(tmp_path):
    n = 6
    path = str(tmp_path / "tv.bin")
    sites = [("1", 100, "A", "G"), ("2", 250, "C", "T")]
    with bin01.Bin01Writer(path, n, site_mode="tsv") as bw:
        bw.write_rows(np.ones((2, n), np.int8), sites)
    bm = bin01.read_bin01(path)
    assert bm.sites() == sites
    ids = [f"ind{i}" for i in range(n)]
    bin01.write_samples(path, ids)
    got = bin01.read_samples(path)
    assert list(got) == ids


def test_bin01_truncation_detected(tmp_path):
    path = str(tmp_path / "bad.bin")
    with bin01.Bin01Writer(path, 64) as bw:
        bw.write_rows(np.ones((4, 64), np.int8))
    blob = open(path, "rb").read()
    open(path, "wb").write(blob[:-3])
    with pytest.raises(IOError, match="truncated"):
        bin01.read_bin01(path)


def test_garfield_scan_features_on_bin(tmp_path):
    """Planted epistatic AND pair recovered from a BIN01 matrix."""
    from janusx_tpu.models.garfield import garfield_scan_features

    rng = np.random.default_rng(5)
    m, n = 60, 300
    B = (rng.random((m, n)) < 0.4).astype(np.uint8)
    t = (B[3] & B[17]).astype(np.float64) * 2.0 + rng.normal(size=n) * 0.3
    path = str(tmp_path / "feat.bin")
    with bin01.Bin01Writer(path, n) as bw:
        bw.write_rows(B)
    bm = bin01.read_bin01(path)
    res = garfield_scan_features(bm.dense(), t, depth=2, beam=32, n_perm=30,
                                 seed=1)
    top = res.rules[0]
    assert set(top.snps) == {3, 17}
    assert res.pvalues[0] < 0.05
