"""Pinned fixed-seed fixtures for BayesR / BayesL / BSLMM on the demo data.

The reference README publishes numbers only for its three BayesCpi fits
(covered by the golden tests in test_ibrm/test_sbrm/test_ssbrm); R is not
installed in this environment, so BayesR/BayesL/BSLMM cannot be anchored to
fresh reference runs.  Instead these are PINNED REGRESSION FIXTURES: exact
posterior summaries of fixed-seed f64 CPU chains, recorded 2026-08-19.
They guard against silent chain drift (a refactor that changes any draw,
stream order or accumulator shows up as a mismatch here) and encode the
cross-engine sanity relations (ibrm vs sbrm h2 on the same panel).

NOTE these chains are deterministic given (seed, shapes, jax version); if a
jax upgrade changes threefry lowering the pins need regeneration — that is a
feature (the change would silently alter every user's chains otherwise).

History: generating these fixtures exposed a real defect — the summary
engine's BayesR mixture counts subtracted nvar0 twice (sgibbs `real` already
excludes non-estimable SNPs), inverting pi and eventually NaN-ing the
Dirichlet draw.  Fixed via GibbsSpec.real_excl_nvar0; the BayesR pin below
is from the corrected chain and sits consistently with the reference's
published sbrm BayesCpi fit (Vg=324.4, h2=0.761, README.md:297-320).
"""

import csv

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # f64 fixed-seed chains: full lane only

import hibayes_tpu as ht

DEMO = "/root/reference/inst/extdata/demo"
SEED = 20260819
KW = dict(niter=1500, nburn=900, seed=SEED, verbose=False)


@pytest.fixture(scope="module")
def demo():
    import jax

    jax.config.update("jax_enable_x64", True)
    d = ht.read_plink(DEMO)
    rows = list(csv.reader(open(DEMO + ".phe"), delimiter="\t"))
    hdr, body = rows[0], rows[1:]
    data = {h: np.array([r[i] for r in body]) for i, h in enumerate(hdr)}
    for k in ("T1", "bwt"):
        data[k] = np.array(
            [float(x) if x not in ("NA", "") else np.nan for x in data[k]]
        )
    ma = ht.read_sumstat(DEMO + ".ma")
    return d, data, ma


# exact fixed-seed f64 posterior summaries (see module docstring).
# BayesR pins regenerated 2026-08-21: the fold draw moved to Gumbel-max
# (distribution-identical, different RNG realization — n_fold uniforms per
# SNP instead of one); old/new posteriors agree within MC error
# (ibrm h2 0.450 -> 0.459, sbrm h2 0.739 -> 0.760).
IBRM_PINS = {
    "BayesR": dict(Vg=73.36229998951012, Ve=81.34175092046935,
                   h2=0.4593681757977765, mu=34.47073277608872),
    "BayesL": dict(Vg=154.0190764037059, Ve=20.928580753359267,
                   h2=0.8606621999867929, mu=29.587373947163677),
    "BSLMM": dict(Vg=69.04880367577329, Ve=82.31713047574817,
                  h2=0.44369554660759775, mu=39.23817396997397),
}
SBRM_PINS = {
    "BayesR": dict(Vg=312.125464755851, Ve=109.91233724567367,
                   h2=0.7602454083310529),
    "BayesL": dict(Vg=1013.0633629096285, Ve=396.66746194247855,
                   h2=0.7273184839858189),
}


@pytest.mark.parametrize("method", ["BayesR", "BayesL", "BSLMM"])
def test_ibrm_pinned(demo, method):
    import jax.numpy as jnp

    d, data, _ = demo
    fit = ht.ibrm("T1 ~ sex + (1|loc)", data=data, M=d["geno"].values,
                  M_id=d["fam"][1], method=method, dtype=jnp.float64, **KW)
    pins = IBRM_PINS[method]
    np.testing.assert_allclose(fit.Vg, pins["Vg"], rtol=1e-8)
    np.testing.assert_allclose(fit.Ve, pins["Ve"], rtol=1e-8)
    np.testing.assert_allclose(fit.h2, pins["h2"], rtol=1e-8)
    np.testing.assert_allclose(fit.mu, pins["mu"], rtol=1e-8)


@pytest.mark.parametrize("method", ["BayesR", "BayesL"])
def test_sbrm_pinned(demo, method):
    import jax.numpy as jnp

    d, _, ma = demo
    ld = ht.ldmat(d["geno"])
    fit = ht.sbrm(ma, ld, method=method, dtype=jnp.float64, **KW)
    pins = SBRM_PINS[method]
    np.testing.assert_allclose(fit.Vg, pins["Vg"], rtol=1e-8)
    np.testing.assert_allclose(fit.Ve, pins["Ve"], rtol=1e-8)
    np.testing.assert_allclose(fit.h2, pins["h2"], rtol=1e-8)


def test_cross_engine_h2_consistency(demo):
    """ibrm and sbrm see the same panel: both BayesR h2 estimates must be
    plausible heritabilities; the summary fit (N=300 GWAS subsample, full
    LD) is known to run higher on this data (README sbrm BayesCpi h2=0.761
    vs ibrm BayesCpi h2=0.492)."""
    assert 0.30 < IBRM_PINS["BayesR"]["h2"] < 0.60
    assert 0.55 < SBRM_PINS["BayesR"]["h2"] < 0.90
