"""BSLMM: polygenic eigen-basis block draw + sparse SNP effects."""

import numpy as np
import pytest

import hibayes_tpu as ht


@pytest.mark.slow
def test_bslmm_synthetic():
    rng = np.random.default_rng(31)
    n, m = 300, 400
    M = rng.binomial(2, rng.uniform(0.1, 0.5, m), size=(n, m)).astype(np.float32)
    # polygenic background + a few large effects
    b_small = rng.normal(0, 0.03, m)
    b_big = np.zeros(m)
    b_big[rng.choice(m, 5, replace=False)] = rng.normal(0, 0.8, 5)
    gv = M @ (b_small + b_big)
    gv = (gv - gv.mean()) / gv.std()
    y = gv + rng.normal(0, 1.0, n)
    ids = np.array([f"i{k}" for k in range(n)])
    fit = ht.ibrm(
        "y~1", data={"id": ids, "y": y}, M=M, M_id=ids, method="BSLMM",
        niter=1500, nburn=900, verbose=False,
    )
    assert fit.Va is not None and fit.Vb is not None
    assert fit.Va >= 0 and fit.Vb >= 0
    assert np.isfinite(fit.alpha).all()
    corr = np.corrcoef(fit.g["gebv"], gv)[0, 1]
    assert corr > 0.55, f"BSLMM GEBV corr too low: {corr}"


def test_bslmm_demo():
    bin_ = ht.read_plink("/root/reference/inst/extdata/demo")
    pheno = {}
    with open("/root/reference/inst/extdata/demo.phe") as f:
        header = f.readline().split()
        rows = [line.split() for line in f if line.strip()]
    for i, h in enumerate(header):
        col = np.array([r[i] for r in rows])
        try:
            col = col.astype(np.float64)
        except ValueError:
            pass
        pheno[h] = col
    fit = ht.ibrm(
        "T1~1", data=pheno, M=bin_["geno"].values, M_id=bin_["fam"][1],
        method="BSLMM", niter=800, nburn=500, verbose=False,
    )
    assert 0 < fit.h2 < 1
    assert np.isfinite(fit.alpha).all()
    assert np.isfinite(fit.g["gebv"]).all()
