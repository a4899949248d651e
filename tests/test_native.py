"""Native C++ bed codec: parity with the NumPy reference path."""

import numpy as np
import pytest

from hibayes_tpu.data import plink
from hibayes_tpu.native import bed_codec

pytestmark = pytest.mark.skipif(
    not bed_codec.available(), reason="no C++ toolchain to build the codec"
)


def test_native_decode_matches_numpy():
    rng = np.random.default_rng(0)
    n, m = 601, 53
    g = rng.integers(0, 3, size=(n, m)).astype(np.int8)
    g[rng.random((n, m)) < 0.07] = -9
    payload = np.frombuffer(plink.encode_bed_bytes(g), dtype=np.uint8)[3:]
    dec_native = bed_codec.decode(payload, n, m, "A")
    np.testing.assert_array_equal(dec_native, g)
    # dominant coding
    dec_d = bed_codec.decode(payload, n, m, "D")
    expect = np.where(g == -9, -9, np.where(g == 1, 1, 0)).astype(np.int8)
    np.testing.assert_array_equal(dec_d, expect)


def test_native_encode_roundtrip():
    rng = np.random.default_rng(1)
    n, m = 37, 11
    g = rng.integers(0, 3, size=(n, m)).astype(np.int8)
    payload = bed_codec.encode(g)
    dec = plink.decode_bed_bytes(payload, n, m, "A")
    np.testing.assert_array_equal(dec, g)


def test_native_impute_matches_numpy():
    rng = np.random.default_rng(2)
    n, m = 200, 40
    g = rng.integers(0, 3, size=(n, m)).astype(np.int8)
    g[rng.random((n, m)) < 0.15] = -9
    expect = plink.impute_major(g.copy())
    out = bed_codec.impute_major_inplace(np.ascontiguousarray(g.copy()))
    np.testing.assert_array_equal(out, expect)


def test_native_col_stats():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 3, size=(100, 20)).astype(np.int8)
    st = bed_codec.col_stats(g)
    gf = g.astype(np.float64)
    np.testing.assert_allclose(st["mean"], gf.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(st["sum"], gf.sum(axis=0), rtol=1e-12)
    np.testing.assert_allclose(
        st["sqrt_ssd"], np.sqrt(((gf - gf.mean(0)) ** 2).sum(0)), rtol=1e-9
    )


def test_read_plink_uses_native_when_available():
    data = plink.read_plink("/root/reference/inst/extdata/demo")
    assert data["geno"].values.shape == (600, 1000)
