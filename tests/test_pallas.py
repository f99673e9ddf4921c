"""Pallas fused decode+rotate kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

from janusx_tpu.io import bitcodec


def test_decode_rotate_matches_reference(rng):
    from janusx_tpu.ops.pallas_kernels import rotate_block_pallas

    M, n = 100, 300
    codes = rng.integers(0, 4, size=(M, n)).astype(np.uint8)
    packed = bitcodec.pack_codes(codes)
    mean = rng.uniform(0, 2, M).astype(np.float32)
    U = rng.normal(size=(n, 64)).astype(np.float32)
    # pad K to byte multiple: decode width = 4*ceil(n/4)
    Kb = packed.shape[1]
    K = Kb * 4
    Upad = np.zeros((K, 64), np.float32)
    Upad[:n] = U
    out = np.asarray(
        rotate_block_pallas(packed, mean, Upad, interpret=True)
    )
    # reference: centered decode then matmul
    x = codes.astype(np.float32) - mean[:, None]
    x[codes == 3] = 0.0
    expect = x @ U
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-4)
