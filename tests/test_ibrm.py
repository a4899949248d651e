"""End-to-end `ibrm` tests on the bundled reference demo data and synthetics."""

import numpy as np
import pytest

import hibayes_tpu as ht

DEMO = "/root/reference/inst/extdata/demo"


def load_demo():
    bin_ = ht.read_plink(DEMO)
    pheno = {}
    with open(DEMO + ".phe") as f:
        header = f.readline().split()
        rows = [line.split() for line in f if line.strip()]
    for i, h in enumerate(header):
        col = np.array([r[i] for r in rows])
        try:
            col = col.astype(np.float64)
        except ValueError:
            pass
        pheno[h] = col
    return bin_, pheno


@pytest.fixture(scope="module")
def demo():
    return load_demo()


def test_read_plink_demo(demo):
    bin_, pheno = demo
    geno = bin_["geno"]
    assert geno.n == 600 and geno.m == 1000
    vals = np.unique(geno.values)
    assert set(vals.tolist()) <= {0, 1, 2}
    assert len(bin_["map"]["SNP"]) == 1000
    assert len(pheno["id"]) == 500


def test_ibrm_demo_bayescpi(demo):
    bin_, pheno = demo
    fit = ht.ibrm(
        "T1~1", data=pheno, M=bin_["geno"].values, M_id=bin_["fam"][1],
        method="BayesCpi", niter=2000, nburn=1200, thin=5, verbose=False, seed=666666,
    )
    # 300 of the 600 genotyped ids are phenotyped (demo.phe covers
    # IND1001-IND1500, fam covers IND0701-IND1300); GEBV for all 600
    assert len(fit.g["id"]) == 600
    assert len(fit.e["id"]) == 300
    assert 0.0 < fit.h2 < 1.0
    assert fit.Vg > 0 and fit.Ve > 0
    assert fit.alpha.shape == (1000,)
    assert np.isfinite(fit.alpha).all()
    assert fit.pip.shape == (1000,)
    assert ((fit.pip >= 0) & (fit.pip < 1)).all()
    # summary machinery works
    summ = fit.summary()
    text = str(summ)
    assert "Vg" in text and "Residual" in text


def test_ibrm_demo_fixed_and_random_effects(demo):
    bin_, pheno = demo
    fit = ht.ibrm(
        "T1~sex+bwt+(1|loc)", data=pheno, M=bin_["geno"].values, M_id=bin_["fam"][1],
        method="BayesCpi", niter=1200, nburn=700, thin=5, verbose=False,
    )
    assert fit.beta is not None and len(fit.beta) == 2  # sexMale + bwt
    assert fit.Vr is not None and len(fit.Vr) == 1
    assert fit.Vr[0] >= 0
    assert fit.r is not None


def test_ibrm_demo_gwas_windows(demo):
    bin_, pheno = demo
    m = bin_["map"]
    fit = ht.ibrm(
        "T1~1", data=pheno, M=bin_["geno"].values, M_id=bin_["fam"][1],
        method="BayesCpi", map=m, windsize=1e6,
        niter=1200, nburn=700, thin=5, verbose=False,
    )
    assert fit.gwas is not None
    wppa = fit.gwas["WPPA"]
    assert ((wppa >= 0) & (wppa < 1)).all()
    assert int(fit.gwas["N"].sum()) == 1000


def test_ibrm_h2_recovery_synthetic():
    rng = np.random.default_rng(11)
    n, m, h2_true = 600, 800, 0.5
    M = rng.binomial(2, rng.uniform(0.1, 0.5, m), size=(n, m)).astype(np.float32)
    b = np.zeros(m)
    causal = rng.choice(m, 40, replace=False)
    b[causal] = rng.normal(0, 1, 40)
    gv = M @ b
    gv = (gv - gv.mean()) / gv.std() * np.sqrt(h2_true)
    y = gv + rng.normal(0, np.sqrt(1 - h2_true), n)
    ids = np.array([f"i{k}" for k in range(n)])
    data = {"id": ids, "T1": y}
    fit = ht.ibrm(
        "T1~1", data=data, M=M, M_id=ids, method="BayesCpi",
        niter=3000, nburn=1500, verbose=False,
    )
    assert abs(fit.h2 - h2_true) < 0.12
    corr = np.corrcoef(fit.g["gebv"], gv)[0, 1]
    assert corr > 0.85


def test_ibrm_unphenotyped_gebv():
    """Genotyped-but-unphenotyped individuals still get GEBV (R/bayes.r:303-308)."""
    rng = np.random.default_rng(5)
    n, m = 300, 400
    M = rng.binomial(2, 0.3, size=(n, m)).astype(np.float32)
    y = (M[:, :10].sum(axis=1) * 0.2 + rng.normal(0, 1, n))
    ids = np.array([f"i{k}" for k in range(n)])
    data = {"id": ids[:250], "T1": y[:250]}  # only 250 phenotyped
    fit = ht.ibrm("T1~1", data=data, M=M, M_id=ids, method="BayesRR",
                  niter=800, nburn=400, verbose=False)
    assert len(fit.g["gebv"]) == 300
    assert np.isfinite(fit.g["gebv"]).all()
    assert len(fit.e["id"]) == 250


def test_ibrm_demo_golden_vs_reference_readme(demo):
    """Statistical parity against the reference's published demo fit.

    The reference README (README.md:137-175) prints the summary of
    `ibrm("T1 ~ season + bwt + (1|loc) + (1|dam)", method="BayesCpi")` on the
    bundled demo data: Vg=52.1 (SD 13.1), h2=0.357 (SD 0.081), Vloc=8.10
    (SD 4.79), Vdam=54.29 (SD 10.10), Ve=30.77 (SD 6.32), pi2=0.073
    (SD 0.039), intercept 32.99 (SD 6.61), bwt 2.399 (SD 0.792), with 300
    observations and 50/150 group levels.  RNG families differ (R Mersenne
    Twister vs threefry), so we check posterior means within 3 published
    posterior SDs — the de-facto golden-output contract of SURVEY.md section 4.
    """
    bin_, pheno = demo
    fit = ht.ibrm(
        "T1~season+bwt+(1|loc)+(1|dam)", data=pheno, M=bin_["geno"].values,
        M_id=bin_["fam"][1], method="BayesCpi", niter=3000, nburn=1500,
        thin=5, verbose=False, seed=666666,
    )
    # structure: 300 obs, treatment contrasts (Fall baseline), group sizes
    assert len(fit.e["id"]) == 300
    assert fit.beta_names == ["seasonSpring", "seasonSummer", "seasonWinter", "bwt"]
    assert len(fit.r["Levels"]) == 50 + 150  # loc 50 + dam 150 group levels
    # posterior means within 3 published posterior SDs
    golden = {
        "Vg": (52.10097, 13.084), "h2": (0.35748, 0.081),
        "Ve": (30.77, 6.323), "mu": (32.992, 6.609),
    }
    assert abs(fit.Vg - golden["Vg"][0]) < 3 * golden["Vg"][1]
    assert abs(fit.h2 - golden["h2"][0]) < 3 * golden["h2"][1]
    assert abs(fit.Ve - golden["Ve"][0]) < 3 * golden["Ve"][1]
    assert abs(fit.mu - golden["mu"][0]) < 3 * golden["mu"][1]
    assert abs(fit.Vr[0] - 8.10) < 3 * 4.785      # loc
    assert abs(fit.Vr[1] - 54.29) < 3 * 10.096    # dam
    assert abs(fit.beta[3] - 2.399) < 3 * 0.792   # bwt
    assert abs(fit.pi[1] - 0.07317) < 3 * 0.039 + 0.05
