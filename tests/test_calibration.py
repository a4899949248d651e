"""Simulation-based calibration: known-truth recovery for the methods whose
golden anchors are self-referential (VERDICT r2 missing #4).

The reference README publishes example outputs only for BayesCpi
(/root/reference/README.md:137-175, 297-320, 350-384); BayesR / BayesL /
BSLMM semantics (src/Bayes.cpp:607-815) are guarded here by recovering
*known simulated truth* — a shared semantic error in both our engines cannot
fake h2/GEBV/PIP recovery on data where the generative values are known.

Architecture: sparse causal set with var-standardised genetic values so the
true h2 is exact by construction.  Bounds (±0.1 on h2, GEBV corr >= 0.85,
fold-assignment posterior frequencies from the alpha samples) are tight
enough to catch a 10%-scale semantic error (e.g. a mis-scaled vara_fold)
while staying comfortably outside MC noise at 4000-iteration chains.
"""

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # heavy shard_map/interpret compiles: full lane only


import hibayes_tpu as ht


def simulate(seed=7, n=1500, m=400, n_causal=25, h2=0.5):
    rng = np.random.default_rng(seed)
    maf = rng.uniform(0.1, 0.5, m)
    M = rng.binomial(2, maf[None, :], (n, m)).astype(np.int8)
    causal = np.sort(rng.choice(m, n_causal, replace=False))
    b = np.zeros(m)
    b[causal] = rng.normal(0.0, 1.0, n_causal)
    gv = (M - M.mean(axis=0)) @ b
    gv *= np.sqrt(h2 / gv.var())
    e = rng.normal(0.0, np.sqrt(1.0 - h2), n)
    y = gv + e
    ids = np.array([f"I{i}" for i in range(n)])
    return {
        "M": M, "y": y, "ids": ids, "causal": causal, "gv": gv, "h2": h2,
        "b": b,
    }


@pytest.fixture(scope="module")
def sim():
    return simulate()


def _fit(sim_d, method, niter=4000, nburn=2000, **kw):
    return ht.ibrm(
        "y~1", data={"id": sim_d["ids"], "y": sim_d["y"]}, M=sim_d["M"],
        M_id=sim_d["ids"], method=method, niter=niter, nburn=nburn, thin=5,
        verbose=False, seed=31, **kw,
    )


def _check_recovery(fit, sim_d, h2_tol=0.1, gebv_floor=0.85, pip_ratio=3.0):
    assert abs(fit.h2 - sim_d["h2"]) < h2_tol, f"h2={fit.h2}"
    gebv = fit.g["gebv"]
    c = np.corrcoef(gebv, sim_d["gv"])[0, 1]
    assert c > gebv_floor, f"GEBV corr={c}"
    if pip_ratio is not None:
        causal = sim_d["causal"]
        null = np.setdiff1d(np.arange(len(fit.pip)), causal)
        r = fit.pip[causal].mean() / max(fit.pip[null].mean(), 1e-9)
        assert r > pip_ratio, f"PIP enrichment={r}"


def test_bayesr_known_truth(sim):
    """BayesR multi-mixture (src/Bayes.cpp:743-815): h2/GEBV/PIP recovery
    plus fold assignment — big-effect causals must land in a nonzero fold
    with high posterior frequency (track == alpha != 0 per record)."""
    fit = _fit(sim, "BayesR")
    _check_recovery(fit, sim)
    # fold-assignment recovery from the per-record alpha samples: for each
    # top-|b| causal, the posterior frequency of being in a NONZERO fold
    # (exactly the track>0 frequency — alpha==0 <=> fold 0) must be high,
    # and the posterior effect magnitudes must track the generative ones.
    top = sim["causal"][np.argsort(-np.abs(sim["b"][sim["causal"]]))[:5]]
    a_samp = np.asarray(fit.MCMCsamples["alpha"])  # (n_records, m)
    nz_freq = (a_samp[:, top] != 0.0).mean(axis=0)
    assert np.all(nz_freq > 0.9), f"top-causal nonzero freq {nz_freq}"
    c_eff = np.corrcoef(np.abs(fit.alpha[sim["causal"]]),
                        np.abs(sim["b"][sim["causal"]]))[0, 1]
    assert c_eff > 0.8, f"causal |effect| corr {c_eff}"
    # mixture proportions: pi[0] (null share) should reflect the sparse
    # architecture (25/400 causal -> pi0 well above 0.5)
    assert fit.pi[0] > 0.5


def test_bayesa_known_truth(sim):
    """BayesA (src/Bayes.cpp:607-626): per-SNP scaled-inv-chi2 variances, no
    spike — h2 and GEBV recovery only."""
    fit = _fit(sim, "BayesA")
    _check_recovery(fit, sim, pip_ratio=None)


def test_bayesb_known_truth(sim):
    """BayesBpi (src/Bayes.cpp:627-670): per-SNP variance + spike/slab —
    full recovery including PIP enrichment."""
    fit = _fit(sim, "BayesBpi")
    _check_recovery(fit, sim)


def test_bayesl_known_truth(sim):
    """BayesL / Bayesian LASSO (src/Bayes.cpp:718-742): no spike-slab, so no
    PIP enrichment check; h2 and GEBV recovery only."""
    fit = _fit(sim, "BayesL")
    _check_recovery(fit, sim, pip_ratio=None)


def test_bslmm_known_truth(sim):
    """BSLMM (src/Bayes.cpp:518-552): polygenic eigen-GRM term + sparse
    effects.  h2 here is the SNP-effect share; total genetic signal is
    alpha-GEBV + polygenic u, so check the combined GEBV correlation."""
    fit = _fit(sim, "BSLMM")
    gebv = fit.g["gebv"]
    c = np.corrcoef(gebv, sim["gv"])[0, 1]
    assert c > 0.7, f"BSLMM GEBV corr={c}"
    assert np.isfinite(fit.h2) and 0.0 < fit.h2 < 1.0


def test_sbrm_known_truth(sim):
    """Summary-level chain anchored to the same known truth: per-SNP OLS
    sumstats + in-sample LD must recover h2 and effect correlation
    (src/SBayesD.cpp:92-468).  Catches sbrm-specific semantic drift that the
    ibrm-side oracle tests cannot."""
    M = sim["M"].astype(np.float64)
    y = sim["y"]
    n, m = M.shape
    Mc = M - M.mean(axis=0)
    yc = y - y.mean()
    sxx = (Mc ** 2).sum(axis=0)
    beta = Mc.T @ yc / sxx
    resid_var = np.maximum(yc @ yc / n - beta ** 2 * sxx / n, 1e-8)
    se = np.sqrt(resid_var * n / (n - 2) / sxx)
    maf = M.mean(axis=0) / 2
    sumstat = {
        "SNP": np.array([f"S{j}" for j in range(m)]),
        "A1": np.repeat("A", m), "A2": np.repeat("G", m),
        "MAF": maf, "BETA": beta, "SE": se,
        "P": np.ones(m), "NMISS": np.full(m, n),
    }
    D = Mc / np.sqrt(sxx)
    ldm = D.T @ D
    fit = ht.sbrm(sumstat, ldm, method="BayesCpi", niter=4000, nburn=2000,
                  thin=5, verbose=False, seed=31)
    assert abs(fit.h2 - sim["h2"]) < 0.15, f"sbrm h2={fit.h2}"
    c = np.corrcoef(fit.alpha, sim["b"])[0, 1]
    assert c > 0.7, f"sbrm alpha corr={c}"
    causal, null = sim["causal"], np.setdiff1d(np.arange(m), sim["causal"])
    assert fit.pip[causal].mean() > 2.0 * max(fit.pip[null].mean(), 1e-9)
