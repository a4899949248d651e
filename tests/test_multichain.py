"""Multi-chain execution: vmapped chains match single chains; R-hat sanity."""

import jax
import numpy as np

from hibayes_tpu.engine import gibbs as G


def build(n=200, m=96, B=32):
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    M = rng.binomial(2, 0.3, size=(n, m)).astype(np.float64)
    y = M @ rng.normal(0, 0.15, m) + rng.normal(0, 1, n)
    data = G.prepare_gibbs_data(y, M, block=B, dtype=jnp.float64)
    pi = np.array([0.95, 0.05])
    pr = G.resolve_priors(y, float(np.asarray(data.vx).sum()), pi[0], nr=0)
    spec = G.GibbsSpec(
        model="BayesCpi", n=n, m=m, m_pad=int(data.xpx.shape[0]), block=B,
        nc=0, nlevels=(), n_fold=2, niter=200, nburn=100, thin=5,
        nvar0=int((np.asarray(data.vx)[:m] == 0).sum()),
        dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare, s2vare=pr.s2vare,
        s2varg=pr.s2varg, lambda_rate0=pr.lambda_rate0, resync_every=0,
    )
    return data, spec, pr, pi


def test_multichain_matches_individual_chains():
    data, spec, pr, pi = build()
    states, samples, extras = G.run_chains(spec, data, pr, pi, seed=5, nchains=3)
    assert samples["alpha"].shape[0] == 3
    # chain 0 of the batch must equal a single chain run with the same key
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    for c in range(3):
        state0 = G.init_state(spec, data, pr, pi)
        _, s_single = G._run_all(spec, data, keys[c], state0)
        np.testing.assert_allclose(
            np.asarray(samples["Vg"][c]), np.asarray(s_single["Vg"]), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(samples["alpha"][c]),
            np.asarray(s_single["alpha"])[:, : spec.m],
            rtol=1e-10, atol=1e-14,
        )


def test_rhat_converged_chain_near_one():
    data, spec, pr, pi = build()
    _, samples, extras = G.run_chains(spec, data, pr, pi, seed=5, nchains=4)
    rhat = extras["rhat"]
    assert "Vg" in rhat and "Ve" in rhat
    assert 0.9 < rhat["Ve"] < 1.3, rhat
