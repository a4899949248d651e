"""Row padding of the individual axis (prepare_gibbs_data pad_n).

The chunked Pallas sweeps slice residual rows at 128-aligned lane offsets,
so odd cohort sizes (the 50k-individual flagship: 50,000 % 512 != 0) are
zero-padded up to a multiple of 512.  Zero rows are exact no-ops in every
dot product and all statistics use n_real, so the padded chain must match
the unpadded chain to f64 round-off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hibayes_tpu.engine import gibbs as G
from hibayes_tpu.ops.blockgibbs import _pick_chunk


def _build(pad, n=100, m=64, B=32, model="BayesCpi", seed=3):
    rng = np.random.default_rng(seed)
    M = rng.binomial(2, 0.3, size=(n, m)).astype(np.float64)
    y = M @ rng.normal(0, 0.15, m) + rng.normal(0, 1, n)
    C = rng.normal(size=(n, 2))
    codes = rng.integers(0, 4, n).astype(np.int32)
    pi = np.array([0.95, 0.05])
    data = G.prepare_gibbs_data(
        y, M, C=C, r_codes=(codes,), r_nlevels=(4,), block=B,
        dtype=jnp.float64, pad_n=pad,
    )
    pr = G.resolve_priors(y, float(np.asarray(data.vx).sum()), pi[0], nr=1)
    spec = G.GibbsSpec(
        model=model, n=int(data.y.shape[0]), n_real=n, m=m,
        m_pad=int(data.xpx.shape[0]), block=B, nc=2, nlevels=(4,),
        n_fold=2, niter=40, nburn=20, thin=5,
        nvar0=int((np.asarray(data.vx)[:m] == 0).sum()),
        dfvara=pr.dfvara, s2vara=pr.s2vara, dfvare=pr.dfvare,
        s2vare=pr.s2vare, dfr=pr.dfr, s2r=pr.s2r, s2varg=pr.s2varg,
        lambda_rate0=pr.lambda_rate0, resync_every=3,  # exercise the resync
    )
    return data, spec, pr, pi


@pytest.mark.parametrize("model", [
    "BayesCpi",
    pytest.param("BayesR", marks=pytest.mark.slow),
    pytest.param("BayesRR", marks=pytest.mark.slow),
])
def test_row_padded_chain_matches_unpadded(model):
    data_u, spec_u, pr, pi = _build(False, model=model)
    data_p, spec_p, _, _ = _build(True, model=model)
    assert spec_p.n == 512 and spec_p.row_padded
    # column stats must agree exactly (padded rows excluded)
    np.testing.assert_allclose(np.asarray(data_u.vx),
                               np.asarray(data_p.vx), rtol=1e-14)
    key = jax.random.PRNGKey(7)
    su = G.init_state(spec_u, data_u, pr, pi)
    sp = G.init_state(spec_p, data_p, pr, pi)
    step_u = jax.jit(lambda s: G.one_iteration(spec_u, data_u, key, s))
    step_p = jax.jit(lambda s: G.one_iteration(spec_p, data_p, key, s))
    for it in range(5):
        su = step_u(su)
        sp = step_p(sp)
        np.testing.assert_allclose(np.asarray(sp.g), np.asarray(su.g),
                                   rtol=1e-10, atol=1e-12, err_msg=f"it {it}")
        np.testing.assert_allclose(float(sp.vara), float(su.vara), rtol=1e-10)
        np.testing.assert_allclose(float(sp.vare), float(su.vare), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(sp.yadj)[:100],
                                   np.asarray(su.yadj), rtol=1e-9, atol=1e-11)
        # the padded tail must stay exactly zero (it feeds sum/dot reductions)
        assert np.all(np.asarray(sp.yadj)[100:] == 0.0)
        assert np.all(np.asarray(sp.u)[100:] == 0.0)


def test_pad_n_refused_with_bslmm_or_epsl():
    rng = np.random.default_rng(0)
    M = rng.binomial(2, 0.3, size=(32, 16)).astype(np.float64)
    y = rng.normal(size=32)
    with pytest.raises(ValueError, match="pad_n"):
        G.prepare_gibbs_data(y, M, K=np.eye(32), Kval=np.ones(32),
                             block=16, pad_n=True)


def test_pick_chunk_lane_aligned():
    """Chunk sizes must be multiples of 128 (Mosaic lane-offset alignment);
    n=50,000 has no aligned divisor (the padding case), n=51,200 does."""
    for n in (16384, 32768, 51200, 50176):
        c = _pick_chunk(n)
        assert c == 0 or (c % 128 == 0 and n % c == 0 and c >= 512)
    assert _pick_chunk(50000) == 0
    assert _pick_chunk(51200) == 2048
