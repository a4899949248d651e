"""Unit tests: PLINK codec, windows, formula parsing."""

import numpy as np
import pytest

from hibayes_tpu.data import plink
from hibayes_tpu.data.windows import build_windows, cutwind_by_bp, cutwind_by_num, remap_chr
from hibayes_tpu.model.formula import build_model_frame, parse_formula


# ---------------------------------------------------------------- plink codec
def test_bed_roundtrip():
    rng = np.random.default_rng(0)
    for n, m in [(7, 5), (8, 3), (601, 17)]:
        g = rng.integers(0, 3, size=(n, m)).astype(np.int8)
        g[rng.random((n, m)) < 0.1] = -9
        payload = np.frombuffer(plink.encode_bed_bytes(g), dtype=np.uint8)[3:]
        dec = plink.decode_bed_bytes(payload, n, m, "A")
        np.testing.assert_array_equal(dec, g)


def test_bed_dominant_coding():
    g = np.array([[0, 1, 2, -9]], dtype=np.int8).T  # 4 individuals, 1 SNP
    payload = np.frombuffer(plink.encode_bed_bytes(g), dtype=np.uint8)[3:]
    d = plink.decode_bed_bytes(payload, 4, 1, "D")
    # additive 0/1/2/NA -> dominant 0/1/0/NA (src/read_bed.cpp:117-127)
    np.testing.assert_array_equal(d[:, 0], np.array([0, 1, 0, -9], dtype=np.int8))


def test_impute_major():
    g = np.array([[0, 0, 0, 1, 2, -9], [2, 2, -9, -9, 1, 0]], dtype=np.int8).T
    out = plink.impute_major(g)
    assert out[5, 0] == 0  # major genotype of col0 is 0
    assert out[2, 1] == 2 and out[3, 1] == 2
    assert (out != -9).all()


def test_read_plink_demo_coding():
    """Verify decode against the reference contract: A1A1=2 (R/read_plink.r:20)."""
    data = plink.read_plink("/root/reference/inst/extdata/demo")
    g = data["geno"].values
    assert g.shape == (600, 1000)
    # allele frequencies must match the .ma MAF column approximately:
    # demo.ma row 1: M1 MAF=0.5267 (A1=G counted)
    p = g[:, 0].mean() / 2
    maf = min(p, 1 - p)
    assert abs(maf - 0.5267) < 0.06  # .ma is from a different sample (N=300)


def test_genomatrix_persistence(tmp_path):
    g = np.random.default_rng(1).integers(0, 3, (10, 6)).astype(np.int8)
    gm = plink.GenoMatrix(values=g)
    gm.save(str(tmp_path / "geno"))
    gm2 = plink.GenoMatrix.attach(str(tmp_path / "geno"))
    np.testing.assert_array_equal(np.asarray(gm2.values), g)


# ------------------------------------------------------------------- windows
def test_cutwind_by_bp():
    chrom = np.array([1, 1, 1, 2, 2], dtype=float)
    pos = np.array([10, 150, 290, 5, 320], dtype=float)
    w = cutwind_by_bp(chrom, pos, 100.0)
    # chr1: bins [1,101),[101,201),[201,301) -> 1,2,3 ; chr2: [1,101)->4, [301,401)->5
    np.testing.assert_array_equal(w, [1, 2, 3, 4, 5])


def test_cutwind_by_bp_skips_empty():
    chrom = np.ones(3)
    pos = np.array([10.0, 20.0, 950.0])
    w = cutwind_by_bp(chrom, pos, 100.0)
    np.testing.assert_array_equal(w, [1, 1, 2])  # empty bins not numbered


def test_cutwind_by_num():
    chrom = np.ones(7)
    pos = np.array([70, 10, 30, 20, 50, 60, 40], dtype=float)
    w = cutwind_by_num(chrom, pos, 3)
    # sorted positions 10,20,30 | 40,50,60 | 70
    expect = {10: 1, 20: 1, 30: 1, 40: 2, 50: 2, 60: 2, 70: 3}
    np.testing.assert_array_equal(w, [expect[p] for p in pos])


def test_remap_chr_xy():
    c = remap_chr(np.array(["1", "2", "X", "Y", "2"]))
    np.testing.assert_array_equal(c, [1, 2, 3, 4, 2])


def test_build_windows_info():
    chrom = np.array(["1", "1", "2"])
    pos = np.array([100, 900, 100])
    wi, info = build_windows(chrom, pos, windsize=500)
    # chr1 bins [1,501) and [501,1001) -> two windows; chr2 -> one
    assert wi.max() == 3
    assert info["N"].tolist() == [1, 1, 1]
    assert info["Chr"].tolist() == ["1", "1", "2"]


# ------------------------------------------------------------------- formula
def test_parse_formula():
    pf = parse_formula("T1 ~ sex + bwt + (1|loc) + (1|dam:loc)")
    assert pf.response == "T1"
    assert pf.fixed_terms == ["sex", "bwt"]
    assert pf.random_terms == ["loc", "dam:loc"]


def test_parse_formula_rejects_bad_random():
    with pytest.raises(ValueError):
        parse_formula("y ~ (x | g)")


def test_model_frame_design():
    data = {
        "id": np.array(["a", "b", "c", "d"]),
        "y": np.array([1.0, 2.0, np.nan, 4.0]),
        "sex": np.array(["M", "F", "M", "F"]),
        "w": np.array([1.0, 2.0, 3.0, 4.0]),
        "loc": np.array(["l1", "l2", "l1", "l2"]),
    }
    mf = build_model_frame("y ~ sex + w + (1|loc)", data)
    assert mf.keep_mask.tolist() == [True, True, False, True]
    assert mf.X.shape == (3, 2)  # sexM dummy + w
    assert mf.X_names == ["sexM", "w"]
    np.testing.assert_array_equal(mf.X[:, 0], [1.0, 0.0, 0.0])  # M dummy (F dropped)
    assert mf.R_codes[0].tolist() == [0, 1, 1]
    assert mf.y.tolist() == [1.0, 2.0, 4.0]


def test_model_frame_intercept_only():
    data = {"id": np.array(["a", "b"]), "y": np.array([1.0, 2.0])}
    mf = build_model_frame("y ~ 1", data)
    assert mf.X is None
    assert mf.R_codes == []
